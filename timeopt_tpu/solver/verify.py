"""Propagator ↔ brute-force consistency check.

Reference counterpart: the legacy pipeline's max|Δ|/RMSE comparison of the
two J(T) curves on the final trajectory (/root/reference/ilqr_propagator.py:
630-643), published as the `consistency_max_abs` / `consistency_rmse`
columns of plots/summary.csv — the closest thing the reference has to a
correctness test (SURVEY.md §4.1). Here it is a first-class utility (and a
property test in tests/test_propagator.py)."""

from __future__ import annotations

import jax.numpy as jnp

from timeopt_tpu.models.base import Problem, System
from timeopt_tpu.solver.augmented import build_augmented, build_terminal_factors
from timeopt_tpu.solver.horizon import bruteforce_J_curve, propagator_select
from timeopt_tpu.solver.linearize import linearize


def consistency_check(
    system: System,
    prob: Problem,
    X: jnp.ndarray,
    U: jnp.ndarray,
    *,
    linearize_mode: str = "ad",
    psd_levels: int = 2,
    lm_lambda: float = 1e-6,
):
    """Compare the propagator and brute-force J(T) curves on one trajectory.

    Returns dict(max_abs, rmse, J_prop, J_bf) over T in [T_min, T_max].

    With the reference's brute-force regularization (lm_lambda=1e-6) the
    difference is dominated by that regularization (~4e-4, the same scale
    the reference publishes); with lm_lambda=0 the factored propagator
    matches the exact quadratic model to ~1e-5 or better (fp64; residual is
    the q_reg/jitter regularization)."""
    Tm = prob.T_max
    A, B = linearize(system.step, X, U, linearize_mode)
    Xh, Uh, Ah, Bh = X[: Tm + 1], U[:Tm], A[:Tm], B[:Tm]

    blocks = build_augmented(system, prob, Xh, Uh, Ah, Bh, psd_levels=psd_levels)
    C = build_terminal_factors(prob, Xh, s=blocks.s)
    J_prop = blocks.s[0] ** 2 * propagator_select(
        blocks, C, psd_levels=psd_levels, terminal_mode="factored"
    )
    J_bf = bruteforce_J_curve(
        system, prob, Ah, Bh, Xh, Uh, psd_levels=psd_levels, lm_lambda=lm_lambda
    )

    lo = prob.T_min - 1
    d = (J_prop - J_bf)[lo:]
    return {
        "max_abs": jnp.max(jnp.abs(d)),
        "rmse": jnp.sqrt(jnp.mean(jnp.square(d))),
        "J_prop": J_prop,
        "J_bf": J_bf,
    }
