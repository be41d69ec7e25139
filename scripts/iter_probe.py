"""Ablation timing of the real per-iteration solve body on TPU.

The whole-solve bench (bench.py) measures ~72 ms per outer iteration at
B=1024; the per-phase XLA probe (phase_probe.py) numbers don't add up to
that because the fused program overlaps/fuses differently. This probe times
the *actual* iteration body (linearize -> fused Pallas select -> backward ->
line search) as one jitted program, then re-times with pieces ablated (XLA
dead-code-eliminates the rest), giving a truthful attribution.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from timeopt_tpu.models import get_system
from timeopt_tpu.solver.backward import backward_truncated
from timeopt_tpu.solver.cost import argmin_T, rollout
from timeopt_tpu.solver.forward import forward_linesearch
from timeopt_tpu.solver.ilqr import (
    SolveOptions,
    _select_curve,
    broadcast_problem,
    resolve_q_reg,
)
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))


def timed(name, fn, *args, reps=3):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(*args)
        for leaf in jax.tree.leaves(out):
            float(leaf)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:9.1f} ms", flush=True)


def main():
    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    opts = SolveOptions(method="propagator", max_iter=12, psd_levels=1)
    print(f"B={B}", flush=True)

    U = jnp.broadcast_to(probs.u_ref[:, None, :], (B, base.N, 4))
    X = jax.jit(jax.vmap(lambda p, u: rollout(system, p, p.x0, u)))(probs, U)

    def chk(*xs):
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in xs)

    def lin(p, x, u):
        return linearize(system.step, x, u, opts.linearize_mode)

    def body_full(probs, X, U):
        def one(p, x, u):
            A, Bm = lin(p, x, u)
            J_curve = _select_curve(system, p, opts, x, u, A, Bm)
            T_star = argmin_T(J_curve, p.T_min, p.T_max)
            bw = backward_truncated(system, p, A, Bm, x, u, T_star, jnp.float32(1e-3))
            ls = forward_linesearch(
                system, p, x, u, bw.K, bw.kappa, T_star, alphas=opts.alphas,
                df_forward=True,
            )
            return chk(ls.X, ls.U, ls.J, J_curve)
        return jnp.sum(jax.vmap(one)(probs, X, U))

    def body_lin(probs, X, U):
        def one(p, x, u):
            A, Bm = lin(p, x, u)
            return chk(A, Bm)
        return jnp.sum(jax.vmap(one)(probs, X, U))

    def body_lin_select(probs, X, U):
        def one(p, x, u):
            A, Bm = lin(p, x, u)
            J_curve = _select_curve(system, p, opts, x, u, A, Bm)
            return chk(J_curve)
        return jnp.sum(jax.vmap(one)(probs, X, U))

    def body_lin_select_bw(probs, X, U):
        def one(p, x, u):
            A, Bm = lin(p, x, u)
            J_curve = _select_curve(system, p, opts, x, u, A, Bm)
            T_star = argmin_T(J_curve, p.T_min, p.T_max)
            bw = backward_truncated(system, p, A, Bm, x, u, T_star, jnp.float32(1e-3))
            return chk(bw.K, bw.kappa, J_curve)
        return jnp.sum(jax.vmap(one)(probs, X, U))

    timed("lin", body_lin, probs, X, U)
    timed("lin+select", body_lin_select, probs, X, U)
    timed("lin+select+bw", body_lin_select_bw, probs, X, U)
    timed("full iter (lin+sel+bw+fwd)", body_full, probs, X, U)


if __name__ == "__main__":
    main()
