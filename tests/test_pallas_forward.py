"""Parity tests for the fused forward line-search kernel
(ops/pallas_forward.py) against the production batch-leading path
(solver/forward.py + rollout_df), plus rows-form dynamics parity
(models/base.py xdot_rows/guard_rows).

Kernel runs in interpret mode here (CPU); interpret + compiled-CPU degrade
the df32 tricks (CLAUDE.md invariant #2), hence loose value tolerances.
Exact agreement of the df arithmetic is verified on real TPU hardware
(scripts/fwd_probe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timeopt_tpu.models import get_system
from timeopt_tpu.ops.pallas_forward import linesearch_lanes_df
from timeopt_tpu.solver.backward import backward_truncated
from timeopt_tpu.solver.cost import cost_true
from timeopt_tpu.solver.forward import forward_linesearch
from timeopt_tpu.solver.ilqr import broadcast_problem, default_U_init
from timeopt_tpu.solver.linearize import linearize
from timeopt_tpu.solver.rollout_df import rollout_df

ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.05)


def test_xdot_rows_matches_xdot(rng):
    from timeopt_tpu.models import quadrotor as q

    x = rng.standard_normal((12, 64))
    u = rng.standard_normal((4, 64)) + np.asarray([q.MASS * q.G, 0, 0, 0])[:, None]
    d_rows = np.asarray(q.xdot_rows(jnp.asarray(x), jnp.asarray(u)))
    d_ref = np.stack(
        [np.asarray(q.xdot(jnp.asarray(x[:, i]), jnp.asarray(u[:, i]))) for i in range(64)],
        axis=-1,
    )
    np.testing.assert_allclose(d_rows, d_ref, rtol=1e-13, atol=1e-13)


def test_guard_rows_matches_guard(rng):
    from timeopt_tpu.models import quadrotor as q

    x = rng.standard_normal((12, 32))
    u = rng.standard_normal((4, 32))
    # trip each guard condition on some columns
    x[7, 0] = np.pi / 2  # Euler singularity
    x[9, 1] = 2e3  # omega blowup
    x[0, 2] = 2e6  # norm blowup
    x[3, 3] = np.nan
    u[0, 4] = np.inf
    g_rows = np.asarray(q.guard_rows(jnp.asarray(x), jnp.asarray(u)))
    g_ref = np.asarray(
        [bool(q.guard(jnp.asarray(x[:, i]), jnp.asarray(u[:, i]))) for i in range(32)]
    )
    assert g_rows.dtype == np.bool_
    np.testing.assert_array_equal(g_rows, g_ref)
    assert g_ref[:5].all()


def test_all_systems_rows_form_matches_xdot(rng):
    """Every registered rows form must equal the per-sample xdot on batched
    trailing-layout inputs (the fused forward kernel traces xdot_rows)."""
    from timeopt_tpu.models import SYSTEMS

    checked = 0
    for case in SYSTEMS:
        system, mk = get_system(case)
        if system.xdot_rows is None:
            continue
        x = jnp.asarray(rng.standard_normal((system.n, 16)), jnp.float64)
        u = jnp.asarray(rng.standard_normal((system.m, 16)), jnp.float64)
        d_rows = np.asarray(system.xdot_rows(x, u))
        d_ref = np.stack(
            [np.asarray(system.xdot(x[:, i], u[:, i])) for i in range(16)], axis=-1
        )
        np.testing.assert_allclose(d_rows, d_ref, rtol=1e-13, atol=1e-13, err_msg=case)
        checked += 1
    assert checked >= 5


def _setup(rng, T_fixed, B=8, case="Quadrotor"):
    system, mk = get_system(case)
    base = mk(dtype=jnp.float32)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    if case == "Quadrotor":
        x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    else:
        sx = np.asarray(system.sigma_x0, np.float32)
        x0s += (sx + 0.01) * rng.standard_normal(x0s.shape).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))

    def prep(p):
        U = default_U_init(p)
        X = rollout_df(system, p, p.x0, U)
        A, Bm = linearize(system.step, X, U, "ad")
        T = jnp.asarray(T_fixed, jnp.int32)
        bw = backward_truncated(system, p, A, Bm, X, U, T, jnp.asarray(1e-3, jnp.float32))
        J_old = cost_true(system, p, X, U, T)
        return X, U, bw.K, bw.kappa, T, J_old

    return system, probs, jax.jit(jax.vmap(prep))(probs)


@pytest.mark.parametrize(
    "case,T_fixed,block_b",
    [
        ("Quadrotor", 51, 1024),
        ("Quadrotor", 160, 1024),
        # block_b=2 with B=8 forces a 4-tile grid: exercises the batch-tile
        # axis, the per-tile carry re-initialization, and the gcd tile-size
        # path that production (single-tile at B<=1024) never takes
        ("Quadrotor", 51, 2),
        # cartpole exercises the kernel's in-state df 2-pi wrap branch
        # (system.wrap_idx) that the quadrotor never takes
        ("Cartpole_SwingUp", 181, 1024),
        ("Segway_Balance", 40, 1024),
    ],
)
def test_forward_kernel_matches_production(rng, case, T_fixed, block_b):
    system, probs, (X, U, K, kap, T, J_old) = _setup(rng, T_fixed, case=case)

    def prod(p, X, U, K, kap, T):
        return forward_linesearch(
            system, p, X, U, K, kap, T, alphas=ALPHAS, df_forward=True
        )

    ls = jax.jit(jax.vmap(prod))(probs, X, U, K, kap, T)

    Xn, Un, Jn, acc = jax.jit(
        lambda *a: linesearch_lanes_df(
            system, ALPHAS, *a, block_b=block_b, interpret=True
        )
    )(
        X, U, K, kap, T, J_old,
        probs.xg, probs.u_ref, probs.Q, probs.R, probs.Qf, probs.w, probs.wrap_mask,
    )

    assert Xn.shape == X.shape and Jn.shape == J_old.shape  # no padded rows leak
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ls.accepted))
    # same chosen alpha -> selected trajectories agree to rollout noise.
    # Compare states only on [0, T*]: beyond T* the rollout is OPEN-LOOP on
    # nominal controls, so unstable systems (segway: e^{lambda*dt*(N-T*)} ~
    # 1e8) amplify the interpret-mode df degradation without affecting any
    # decision (cost and finiteness checks beyond T* are what matter, and J
    # is asserted above; on real TPU the df arithmetic is bit-consistent).
    np.testing.assert_allclose(np.asarray(Jn), np.asarray(ls.J), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(Xn)[:, : T_fixed + 1], np.asarray(ls.X)[:, : T_fixed + 1],
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(np.asarray(Un), np.asarray(ls.U), rtol=2e-3, atol=2e-3)


def test_forward_kernel_rejects_poisoned_rollout(rng):
    """A rollout driven into the guard must come back unaccepted with
    J = J_old (the reference skips non-finite rollouts, solver.py:267-280)."""
    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    B = 4
    probs = broadcast_problem(base, B)
    N, n, m = base.N, base.n, base.m
    U = jnp.broadcast_to(probs.u_ref[:, None, :], (B, N, m))
    X = jax.jit(jax.vmap(lambda p, u: rollout_df(system, p, p.x0, u)))(probs, U)
    kap = jnp.full((B, N, m), 1e8, jnp.float32)
    K = jnp.zeros((B, N, m, n), jnp.float32)
    T = jnp.full((B,), 51, jnp.int32)
    J_old = jax.jit(jax.vmap(lambda p, X, U, T: cost_true(system, p, X, U, T)))(
        probs, X, U, T
    )
    Xn, Un, Jn, acc = jax.jit(
        lambda *a: linesearch_lanes_df(system, ALPHAS, *a, interpret=True)
    )(
        X, U, K, kap, T, J_old,
        probs.xg, probs.u_ref, probs.Q, probs.R, probs.Qf, probs.w, probs.wrap_mask,
    )
    assert not np.asarray(acc).any()
    np.testing.assert_array_equal(np.asarray(Jn), np.asarray(J_old))
    np.testing.assert_array_equal(np.asarray(Xn), np.asarray(X))


def test_forward_dense_matches_lanes(rng):
    """Dense-tile forward kernel vs the lanes kernel: shared rank-agnostic
    body, identical op sequence (bitwise on TPU hardware,
    scripts/fwd_dense_probe.py); loose tolerance here because compiled-CPU
    interpret mode degrades the df32 tricks shape-dependently."""
    from timeopt_tpu.ops.pallas_forward import linesearch_dense_df

    system, probs, (X, U, K, kap, T, J_old) = _setup(rng, 51, case="Quadrotor")
    args = (
        X, U, K, kap, T, J_old,
        probs.xg, probs.u_ref, probs.Q, probs.R, probs.Qf, probs.w, probs.wrap_mask,
    )
    Xl, Ul, Jl, al = jax.jit(
        lambda *a: linesearch_lanes_df(system, ALPHAS, *a, block_b=8, interpret=True)
    )(*args)
    Xd, Ud, Jd, ad = jax.jit(
        lambda *a: linesearch_dense_df(system, ALPHAS, *a, tile=(2, 4), interpret=True)
    )(*args)
    np.testing.assert_array_equal(np.asarray(ad), np.asarray(al))
    np.testing.assert_allclose(np.asarray(Jd), np.asarray(Jl), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(Xd)[:, :52], np.asarray(Xl)[:, :52], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(Ud), np.asarray(Ul), rtol=2e-3, atol=2e-3)
