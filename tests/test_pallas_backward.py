"""df32 backward-pass kernel vs the XLA masked scan (interpret mode, loose
f32-level tolerance — interpret degrades the double-single tricks; exact
agreement is verified on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_double_integrator
from timeopt_tpu.ops.pallas_backward import backward_lanes_df
from timeopt_tpu.solver.backward import _backward_arrays, stage_expansion
from timeopt_tpu.ops.linalg import sym
from timeopt_tpu.ops.wrap import wrap_error
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.ilqr import default_U_init


def test_backward_kernel_matches_xla(rng):
    system, prob = tiny_double_integrator(N=10, T_min=2, T_max=8)
    prob32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        prob,
    )
    Bb = 8
    N, n, m = prob.N, 2, 1

    As, Bs, lxs, lus, Qss, QfeTs, etoks, soks, Qfs, Rs, Ts, lms = ([] for _ in range(12))
    refs = []
    for i in range(Bb):
        U = default_U_init(prob32) + 0.1 * jnp.asarray(rng.standard_normal((N, m)), jnp.float32)
        X = rollout(system, prob32, prob32.x0, U)
        from timeopt_tpu.solver.linearize import linearize

        A, B = linearize(system.step, X, U, "ad")
        e, du, lx, lu, _, Qs = stage_expansion(system, prob32, X, U)
        QfT = sym(prob32.Qf)
        eTs = wrap_error(X[1:] - prob32.xg, prob32.wrap_mask)
        QfeT = eTs @ QfT.T
        eT_ok = jnp.all(jnp.isfinite(eTs), -1).astype(jnp.float32)
        s_ok = (jnp.all(jnp.isfinite(e), -1) & jnp.all(jnp.isfinite(du), -1)).astype(jnp.float32)
        T_star = jnp.int32(3 + (i % 5))
        lm = jnp.float32(1e-3)
        refs.append(
            _backward_arrays(A, B, lx, lu, Qs, QfeT, eT_ok, s_ok, QfT, prob32.R, T_star, lm)
        )
        for lst, v in zip(
            (As, Bs, lxs, lus, Qss, QfeTs, etoks, soks, Qfs, Rs, Ts, lms),
            (A, B, lx, lu, Qs, QfeT, eT_ok, s_ok, QfT, prob32.R, T_star, lm),
        ):
            lst.append(v)

    st = lambda xs: jnp.stack(xs, 0)
    kappa, K, ok = backward_lanes_df(
        st(As), st(Bs), st(lxs), st(lus), st(Qss), st(QfeTs), st(etoks), st(soks),
        st(Qfs), st(Rs), st(Ts), st(lms),
        block_b=Bb, interpret=True,
    )

    for i in range(Bb):
        kap_ref, K_ref, ok_ref = refs[i]
        assert bool(ok[i]) == bool(ok_ref)
        np.testing.assert_allclose(
            np.asarray(kappa[i]), np.asarray(kap_ref), rtol=2e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(K[i]), np.asarray(K_ref), rtol=2e-3, atol=1e-4
        )


def test_backward_dense_matches_lanes(rng):
    """Dense-tile backward kernel vs lanes kernel: identical per-element df
    op sequence (bitwise on TPU hardware, scripts/select_dense_probe.py);
    loose tolerance here because compiled-CPU interpret mode degrades the
    df32 tricks shape-dependently (ops/df32.py backend caveat)."""
    from timeopt_tpu.ops.pallas_backward import backward_dense_df

    system, prob = tiny_double_integrator(N=10, T_min=2, T_max=8)
    prob32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        prob,
    )
    Bb = 8
    N, n, m = prob.N, 2, 1

    cols = [[] for _ in range(12)]
    for i in range(Bb):
        U = default_U_init(prob32) + 0.1 * jnp.asarray(rng.standard_normal((N, m)), jnp.float32)
        X = rollout(system, prob32, prob32.x0, U)
        from timeopt_tpu.solver.linearize import linearize

        A, B = linearize(system.step, X, U, "ad")
        e, du, lx, lu, _, Qs = stage_expansion(system, prob32, X, U)
        QfT = sym(prob32.Qf)
        eTs = wrap_error(X[1:] - prob32.xg, prob32.wrap_mask)
        QfeT = eTs @ QfT.T
        eT_ok = jnp.all(jnp.isfinite(eTs), -1).astype(jnp.float32)
        s_ok = (jnp.all(jnp.isfinite(e), -1) & jnp.all(jnp.isfinite(du), -1)).astype(jnp.float32)
        vals = (A, B, lx, lu, Qs, QfeT, eT_ok, s_ok, QfT, prob32.R,
                jnp.int32(3 + (i % 5)), jnp.float32(1e-3))
        for lst, v in zip(cols, vals):
            lst.append(v)

    args = tuple(jnp.stack(xs, 0) for xs in cols)
    kap_l, K_l, ok_l = backward_lanes_df(*args, block_b=Bb, interpret=True)
    for tri in (False, True):
        kap_d, K_d, ok_d = backward_dense_df(
            *args, tile=(2, 4), trisym=tri, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ok_d), np.asarray(ok_l))
        np.testing.assert_allclose(np.asarray(kap_d), np.asarray(kap_l), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(K_d), np.asarray(K_l), rtol=1e-3, atol=1e-4)
