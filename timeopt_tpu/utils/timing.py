"""Phase-level profiling: the reference's 4-phase wall-clock breakdown
(linearize / select / backward / forward — /root/reference/solver.py:497-551,
SURVEY.md §5 'Tracing/profiling') reproduced with device-synchronized timing.

The production solver runs the whole loop inside one jitted program (no
phase boundaries to time), so this module re-runs the solve as a host-driven
loop of individually jitted phases with `block_until_ready` brackets. Use it
for apples-to-apples comparison against the reference's timers and for
locating hot phases; use the fused solver for throughput.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from timeopt_tpu.models.base import Problem, System
from timeopt_tpu.solver.augmented import (
    build_augmented,
    build_terminal_blocks,
    build_terminal_factors,
)
from timeopt_tpu.solver.backward import backward_truncated
from timeopt_tpu.solver.cost import argmin_T, rollout
from timeopt_tpu.solver.forward import forward_linesearch
from timeopt_tpu.solver.horizon import bruteforce_J_curve, propagator_select
from timeopt_tpu.solver.ilqr import SolveOptions, default_U_init, resolve_q_reg
from timeopt_tpu.solver.linearize import linearize


def profile_solve(
    system: System,
    prob: Problem,
    options: Optional[SolveOptions] = None,
    U_init=None,
):
    """Run a propagator/bruteforce solve phase-by-phase with per-phase device
    timers. Returns (result_dict, timers) where timers has the reference's
    keys {linearize, select, backward, forward} in seconds."""
    opts = options or SolveOptions()
    assert opts.method in ("propagator", "bruteforce")
    timers = {"linearize": 0.0, "select": 0.0, "backward": 0.0, "forward": 0.0}

    lin = jax.jit(lambda X, U: linearize(system.step, X, U, opts.linearize_mode))

    Tm = prob.T_max

    @jax.jit
    def select(X, U, A, B):
        Xh, Uh, Ah, Bh = X[: Tm + 1], U[:Tm], A[:Tm], B[:Tm]
        if opts.method == "propagator":
            blocks = build_augmented(
                system, prob, Xh, Uh, Ah, Bh,
                q_reg=resolve_q_reg(opts, X.dtype), rho_reg=opts.rho_reg,
                psd_levels=opts.psd_levels,
                scale=opts.homogeneous_scaling,
            )
            if opts.terminal_mode == "factored":
                terminal = build_terminal_factors(prob, Xh, rho_reg=opts.rho_reg, s=blocks.s)
            else:
                terminal = build_terminal_blocks(prob, Xh, rho_reg=opts.rho_reg, s=blocks.s)
            J = blocks.s[0] ** 2 * propagator_select(
                blocks, terminal,
                scan_mode=opts.scan_mode,
                psd_levels=opts.psd_levels,
                terminal_mode=opts.terminal_mode,
            )
        else:
            J = bruteforce_J_curve(system, prob, Ah, Bh, Xh, Uh, psd_levels=opts.psd_levels)
        return J, argmin_T(J, prob.T_min, prob.T_max)

    bw = jax.jit(
        lambda A, B, X, U, T, lm: backward_truncated(system, prob, A, B, X, U, T, lm)
    )
    fw = jax.jit(
        lambda X, U, K, kap, T: forward_linesearch(
            system, prob, X, U, K, kap, T, alphas=opts.alphas
        )
    )

    def timed(key, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        timers[key] += time.perf_counter() - t0
        return out

    if U_init is None:
        U_init = default_U_init(prob)
    U = U_init
    X = rollout(system, prob, prob.x0, U)
    jax.block_until_ready(X)

    A, B = timed("linearize", lin, X, U)
    J_curve, T_bar = timed("select", select, X, U, A, B)

    lm = jnp.asarray(opts.lm_init, X.dtype)
    res_bw = timed("backward", bw, A, B, X, U, T_bar, lm)
    J_hist, T_hist = [], []
    if bool(res_bw.ok):
        ls = timed("forward", fw, X, U, res_bw.K, res_bw.kappa, T_bar)
        X, U = ls.X, ls.U
        if bool(jnp.isfinite(ls.J)):
            J_hist.append(float(ls.J))
            T_hist.append(int(T_bar))

    for _ in range(opts.max_iter):
        A, B = timed("linearize", lin, X, U)
        J_curve, T_star = timed("select", select, X, U, A, B)
        res_bw = timed("backward", bw, A, B, X, U, T_star, lm)
        acc = False
        if bool(res_bw.ok):
            ls = timed("forward", fw, X, U, res_bw.K, res_bw.kappa, T_star)
            acc = bool(ls.accepted) and bool(jnp.isfinite(ls.J))
        if acc:
            X, U = ls.X, ls.U
            T_bar = T_star
            J_hist.append(float(ls.J))
            T_hist.append(int(T_star))
            lm = jnp.maximum(lm / 10.0, 1e-12)
        else:
            lm = lm * 10.0
        if len(J_hist) >= 2:
            rel = abs(J_hist[-1] - J_hist[-2]) / (abs(J_hist[-2]) + 1e-12)
            if rel < opts.rel_tol and len(T_hist) >= 3 and len(set(T_hist[-3:])) == 1:
                break

    result = {
        "X": X,
        "U": U,
        "J_hist": J_hist,
        "T_hist": T_hist,
        "J_curve": J_curve,
        "T_star": T_hist[-1] if T_hist else int(T_bar),
        "timers": timers,
    }
    return result, timers
