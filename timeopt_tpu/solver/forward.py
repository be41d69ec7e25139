"""Forward pass with line search, vectorized over step sizes.

Reference counterpart: forward_linesearch_fixedT
(/root/reference/solver.py:233-286). The reference tries step sizes
sequentially and stops at the first improvement; here all candidate alphas
roll out concurrently under `vmap` (fixed shapes, no early exit) and the
*first* improving alpha in the original ordering is selected — identical
accept semantics, better hardware shape (the alpha axis batches with the
problem axis).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from timeopt_tpu.models.base import Problem, System
from timeopt_tpu.ops.precision import full_matmul_precision
from timeopt_tpu.ops.wrap import wrap_error
from timeopt_tpu.solver.cost import cost_true


class LinesearchResult(NamedTuple):
    X: jax.Array
    U: jax.Array
    J: jax.Array
    accepted: jax.Array  # () bool


def rollout_with_gains(
    system: System,
    prob: Problem,
    X: jax.Array,
    U: jax.Array,
    K: jax.Array,
    kappa: jax.Array,
    T_star: jax.Array,
    alpha: jax.Array,
):
    """Roll x+ = f(x, u + [k<T*](K wrap(x - x̄) + alpha kappa)); controls keep
    their nominal values beyond T* (reference: /root/reference/solver.py:274-279).
    Uses the raw step (finite-ness is judged on the whole trajectory by the
    caller, as in the reference)."""
    ks = jnp.arange(prob.N)

    def f(x, inp):
        k, Xk, Uk, Kk, kapk = inp
        active = k < T_star
        dx = wrap_error(x - Xk, prob.wrap_mask)
        du = Kk @ dx + alpha * kapk
        u = Uk + jnp.where(active, du, jnp.zeros_like(du))
        xn = system.step(x, u)
        return xn, (xn, u)

    _, (Xtail, Un) = lax.scan(f, X[0], (ks, X[:-1], U, K, kappa))
    Xn = jnp.concatenate([X[:1], Xtail], axis=0)
    return Xn, Un


def _linesearch_impl(system, prob, X, U, K, kappa, T_star, J_old, alphas, roll):
    """Shared all-alphas evaluation + first-improving selection (the
    reference-parity accept rule, /root/reference/solver.py:247-284). Single
    source of truth for the plain path, the custom_vmap fallback, and —
    semantically — the Pallas kernel's host-side selection."""

    def try_alpha(a):
        Xn, Un = roll(system, prob, X, U, K, kappa, T_star, a)
        # reference rejects an alpha whose rollout goes non-finite anywhere
        # on [0, N], even beyond T* (/root/reference/solver.py:267-280)
        finite = jnp.all(jnp.isfinite(Xn))
        Jn = cost_true(system, prob, Xn, Un, T_star)
        Jn = jnp.where(finite, Jn, jnp.asarray(jnp.inf, Jn.dtype))
        return Xn, Un, Jn

    a_vec = jnp.asarray(alphas, dtype=X.dtype)
    Xs, Us, Js = jax.vmap(try_alpha)(a_vec)

    improved = Js < J_old
    accepted = jnp.any(improved)
    idx = jnp.argmax(improved)  # first improving alpha, preserving order
    Xn = jnp.where(accepted, Xs[idx], X)
    Un = jnp.where(accepted, Us[idx], U)
    Jn = jnp.where(accepted, Js[idx], J_old)
    return Xn, Un, Jn, accepted


def _kernel_applicable(system: System, dtype, df_forward: bool) -> bool:
    """Static gate for the fused Pallas line-search kernel
    (ops/pallas_forward.py): TPU + f32 + df rollout + rows-form dynamics +
    no extra stage cost."""
    if not (df_forward and dtype == jnp.float32):
        return False
    if system.xdot_rows is None or system.extra_cost is not None:
        return False
    if (system.guard is not None) != (system.guard_rows is not None):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _linesearch_core(system: System, alphas: tuple):
    """custom_vmap'd all-alphas line search (df rollout): the unbatched def
    keeps the reference path; under a problem-batch vmap it reroutes to the
    fused Pallas line-search kernel (ops/pallas_forward.py; XLA trailing-batch
    fallback in solver/rollout_df.py) — same pattern as the select/backward
    custom_vmap kernels."""

    def _unbatched(X, U, K, kappa, T_star, J_old, xg, u_ref, Qm, Rm, Qf, w, wrap_mask):
        from timeopt_tpu.models.base import Problem
        from timeopt_tpu.solver.rollout_df import rollout_with_gains_df

        N = U.shape[0]
        prob = Problem(
            x0=X[0], xg=xg, u_ref=u_ref, Q=Qm, R=Rm, Qf=Qf, w=w,
            wrap_mask=wrap_mask, N=N, T_min=1, T_max=N,
        )
        return _linesearch_impl(
            system, prob, X, U, K, kappa, T_star, J_old, alphas,
            rollout_with_gains_df,
        )

    @jax.custom_batching.custom_vmap
    def core(X, U, K, kappa, T_star, J_old, xg, u_ref, Qm, Rm, Qf, w, wrap_mask):
        return _unbatched(X, U, K, kappa, T_star, J_old, xg, u_ref, Qm, Rm, Qf, w, wrap_mask)

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [
            a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, b in zip(args, in_batched)
        ]
        X = args[0]
        if _kernel_applicable(system, X.dtype, True):
            from timeopt_tpu.ops.pallas_forward import (
                linesearch_dense_df_jit,
                linesearch_lanes_df_jit,
            )
            from timeopt_tpu.solver.horizon import _pad_batch, use_dense_select

            # same dense-vs-lanes routing rule as select (the lanes layout
            # pads the A=5 alpha axis to 8 sublanes, +60% on those ops).
            # Backward uses the stricter cost-model gate
            # solver/backward.use_dense_backward instead, so e.g. B=640
            # routes forward/select dense but backward lanes.
            if use_dense_select(X.shape[0]):
                padded, Bb = _pad_batch(list(args), multiple=1024)
                Xn, Un, Jn, acc = linesearch_dense_df_jit(system, alphas, *padded)
            else:
                padded, Bb = _pad_batch(list(args))
                Xn, Un, Jn, acc = linesearch_lanes_df_jit(system, alphas, *padded)
            out = (Xn[:Bb], Un[:Bb], Jn[:Bb], acc[:Bb])
        else:
            out = jax.vmap(_unbatched)(*args)
        return out, (True, True, True, True)

    return core


@full_matmul_precision
def forward_linesearch(
    system: System,
    prob: Problem,
    X: jax.Array,
    U: jax.Array,
    K: jax.Array,
    kappa: jax.Array,
    T_star: jax.Array,
    alphas=(1.0, 0.5, 0.25, 0.1, 0.05),
    df_forward: bool = False,
) -> LinesearchResult:
    if df_forward and _kernel_applicable(system, X.dtype, df_forward):
        J_old = cost_true(system, prob, X, U, T_star)
        core = _linesearch_core(system, tuple(alphas))
        Xn, Un, Jn, accepted = core(
            X, U, K, kappa, T_star, J_old,
            prob.xg, prob.u_ref, prob.Q, prob.R, prob.Qf, prob.w, prob.wrap_mask,
        )
        return LinesearchResult(X=Xn, U=Un, J=Jn, accepted=accepted)

    if df_forward:
        from timeopt_tpu.solver.rollout_df import rollout_with_gains_df as _roll
    else:
        _roll = rollout_with_gains

    J_old = cost_true(system, prob, X, U, T_star)
    Xn, Un, Jn, accepted = _linesearch_impl(
        system, prob, X, U, K, kappa, T_star, J_old, alphas, _roll
    )
    return LinesearchResult(X=Xn, U=Un, J=Jn, accepted=accepted)
