"""Truncated iLQR backward pass as a masked reverse scan.

Reference counterpart: backward_pass_truncated (/root/reference/solver.py:156-230).
The horizon T* is a *traced* value: the scan always runs over the full static
N steps; the terminal expansion is injected where k+1 == T*, steps with
k >= T* pass the value function through unchanged, and their gains are zeroed.
SPD failure of Quu_reg at any active step clears the `ok` flag (the jittable
analogue of the reference's early `return None, None, False`).

The core is an array-only function behind `jax.custom_batching.custom_vmap`:
under a problem-batch vmap on TPU it dispatches to the fused double-single
Pallas kernel (timeopt_tpu.ops.pallas_backward) — same reasons as the
propagator select kernel: batch-on-lanes layout for bandwidth, df32
arithmetic because fp32 Riccati noise measurably flips accept/reject
decisions and final horizons.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from timeopt_tpu.models.base import Problem, System
from timeopt_tpu.ops.precision import full_matmul_precision
from timeopt_tpu.ops.linalg import gj_solve, spd_check, sym
from timeopt_tpu.ops.wrap import wrap_error
from timeopt_tpu.solver.cost import extra_cost_terms


class BackwardResult(NamedTuple):
    kappa: jax.Array  # (N, m) feedforward gains (zero where k >= T*)
    K: jax.Array  # (N, m, n) feedback gains
    ok: jax.Array  # () bool — all active steps SPD & finite


@full_matmul_precision
def stage_expansion(system: System, prob: Problem, X: jax.Array, U: jax.Array):
    """Per-step cost expansion terms along the trajectory:
    e, du, lx, lu, l0, Qstage — (N, ...) arrays."""
    e = wrap_error(X[:-1] - prob.xg, prob.wrap_mask)  # (N, n)
    du = U - prob.u_ref  # (N, m)
    lx = e @ prob.Q.T  # (N, n)
    lu = du @ prob.R.T  # (N, m)
    l0 = (
        0.5 * jnp.einsum("ki,ij,kj->k", e, prob.Q, e)
        + 0.5 * jnp.einsum("ki,ij,kj->k", du, prob.R, du)
        + prob.w
    )
    N = U.shape[0]
    Qstage = jnp.broadcast_to(prob.Q, (N,) + prob.Q.shape)

    extra = extra_cost_terms(system, X[:-1], U)
    if extra is not None:
        c, cx, cxx = extra
        l0 = l0 + c
        lx = lx + cx
        Qstage = sym(Qstage + cxx)
    return e, du, lx, lu, l0, Qstage


def _backward_arrays(A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok_in, Qf, R, T_star, lm_lambda):
    """Array-only masked reverse scan (unbatched reference implementation).

    QfeT[k] = Qf @ wrap(x_{k+1} - xg) (terminal gradient if T* == k+1);
    eT_ok[k] / step_ok_in[k]: finiteness flags (1.0/0.0)."""
    N, n = A.shape[0], A.shape[1]
    m = B.shape[2]
    dtype = A.dtype
    I_m = jnp.eye(m, dtype=dtype)

    def f(carry, inp):
        Vx, Vxx, ok = carry
        k, Ak, Bk, lxk, luk, Qsk, QfeTk, eTokk, sokk = inp

        is_term = (k + 1) == T_star
        Vx_in = jnp.where(is_term, QfeTk, Vx)
        Vxx_in = jnp.where(is_term, Qf, Vxx)
        ok = ok & jnp.where(is_term, eTokk > 0.5, True)

        Qx = lxk + Ak.T @ Vx_in
        Qu = luk + Bk.T @ Vx_in
        Qxx = Qsk + Ak.T @ Vxx_in @ Ak
        Quu = R + Bk.T @ Vxx_in @ Bk
        Qux = Bk.T @ Vxx_in @ Ak

        Quu_reg = sym(Quu) + lm_lambda * I_m
        pd = spd_check(Quu_reg)

        kap = -gj_solve(Quu_reg, Qu)
        Kk = -gj_solve(Quu_reg, Qux)

        Vx_new = Qx + Kk.T @ Qu + Qux.T @ kap + Kk.T @ (Quu @ kap)
        Vxx_new = sym(Qxx + Kk.T @ Qux + Qux.T @ Kk + Kk.T @ Quu @ Kk)

        active = k < T_star
        step_ok = (
            pd
            & (sokk > 0.5)
            & jnp.all(jnp.isfinite(Vx_new))
            & jnp.all(jnp.isfinite(Vxx_new))
        )
        ok = ok & jnp.where(active, step_ok, True)

        Vx_out = jnp.where(active, Vx_new, Vx_in)
        Vxx_out = jnp.where(active, Vxx_new, Vxx_in)
        zero = jnp.asarray(0.0, dtype)
        return (Vx_out, Vxx_out, ok), (
            jnp.where(active, kap, zero),
            jnp.where(active, Kk, zero),
        )

    init = (
        jnp.zeros(n, dtype=dtype),
        jnp.zeros((n, n), dtype=dtype),
        (T_star > 0),
    )
    ks = jnp.arange(N)
    (_, _, ok), (kappa, K) = lax.scan(
        f, init, (ks, A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok_in), reverse=True
    )
    return kappa, K, ok


def _pallas_applicable(x: jax.Array) -> bool:
    try:
        backend_ok = jax.devices()[0].platform == "tpu"
    except Exception:
        backend_ok = False
    return backend_ok and x.dtype == jnp.float32


def use_dense_backward(B: int, n: int) -> bool:
    """Route the truncated backward pass to the dense+trisym kernel?

    Cost-model gate (measured at B=1024 quadrotor: dense+trisym 4.76 ms
    per 1024-block vs lanes 5.35 ms per 8 x 128-lane tiles, i.e. ~0.67 ms
    per tile — dense wins iff 4.76*blocks < 0.67*tiles, ratio ~7.1).
    Unlike select (ratio ~3.8, any B > 512 wins), backward's narrower
    margin means padding-heavy batches (e.g. B=640 -> 1024) would REGRESS
    on dense, so gate on the block/tile ratio. The <= gives the exact
    breakeven (ceil(B/128) == 7*ceil(B/1024), e.g. B in 769..896) to
    dense deliberately: the two sides differ by less than the measured
    5.1-5.4 ms run-to-run noise band, and padding those batches to 1024
    amortizes under the pipelined serving stream. n >= 3 floor: at n=2
    (DoubleIntegrator) the dense backward's tiny (2,2)-slab bodies are
    pure latency and lose end-to-end regardless (measured 129.4k ->
    108.9k solves/s at B=1024)."""
    dense_blocks = -(-B // 1024)
    lanes_tiles = -(-B // 128)
    return 7 * dense_blocks <= lanes_tiles and n >= 3


@jax.custom_batching.custom_vmap
def _backward_core_cv(A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm):
    return _backward_arrays(A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm)


@_backward_core_cv.def_vmap
def _backward_vmap_rule(axis_size, in_batched, A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm):
    # broadcast any unbatched operands (e.g. a shared lm or Qf) to the batch
    args = [A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm]
    args = [
        a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
        for a, b in zip(args, in_batched)
    ]
    A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm = args
    if _pallas_applicable(A):
        # dense+trisym wins where use_dense_backward says so (measured
        # cost model in its docstring; plain dense without trisym is
        # bit-identical to lanes but SLOWER — scripts/bw_dense_probe.py);
        # everything else keeps the lanes layout.
        from timeopt_tpu.ops.pallas_backward import (
            backward_dense_df_jit,
            backward_lanes_df_jit,
        )
        from timeopt_tpu.solver.horizon import _pad_batch

        args = [A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm]
        if use_dense_backward(A.shape[0], A.shape[-1]):
            padded, Bb = _pad_batch(args, multiple=1024)
            kappa, K, ok = backward_dense_df_jit(*padded, trisym=True)
        else:
            from timeopt_tpu.solver.horizon import use_latency_trisym

            padded, Bb = _pad_batch(args)
            kappa, K, ok = backward_lanes_df_jit(
                *padded, trisym=use_latency_trisym(A.shape[0])
            )
        kappa, K, ok = kappa[:Bb], K[:Bb], ok[:Bb]
    else:
        kappa, K, ok = jax.vmap(_backward_arrays)(
            A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm
        )
    return (kappa, K, ok), (True, True, True)


@full_matmul_precision
def backward_truncated(
    system: System,
    prob: Problem,
    A: jax.Array,
    B: jax.Array,
    X: jax.Array,
    U: jax.Array,
    T_star: jax.Array,
    lm_lambda: jax.Array,
) -> BackwardResult:
    e, du, lx, lu, _, Qstage = stage_expansion(system, prob, X, U)
    # Exact symmetry of Qstage/R/Qf is a precondition of the dense+trisym
    # kernel's triangle-only congruences (Vxx symmetry induction,
    # ops/pallas_backward.py); sym() is a bitwise no-op for
    # already-symmetric inputs (0.5*(a+a) == a), so this costs nothing for
    # every built-in model and makes user-supplied asymmetric Q/R follow
    # the same symmetrized semantics on every path.
    Qstage = sym(Qstage)
    QfT = sym(prob.Qf)
    eTs = wrap_error(X[1:] - prob.xg, prob.wrap_mask)  # (N, n)
    QfeT = eTs @ QfT.T
    dtype = X.dtype
    eT_ok = jnp.all(jnp.isfinite(eTs), axis=-1).astype(dtype)
    step_ok = (
        jnp.all(jnp.isfinite(e), axis=-1) & jnp.all(jnp.isfinite(du), axis=-1)
    ).astype(dtype)

    kappa, K, ok = _backward_core_cv(
        A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok,
        QfT, sym(prob.R), T_star.astype(jnp.int32), jnp.asarray(lm_lambda, dtype),
    )
    return BackwardResult(kappa=kappa, K=K, ok=ok)
