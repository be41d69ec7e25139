"""Pallas lanes kernels vs the XLA propagator path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import random_ltv_problem
from timeopt_tpu.models.base import System
from timeopt_tpu.ops.pallas_lft import (
    lft_query_lanes,
    lft_scan_lanes,
    propagator_select_lanes,
)
from timeopt_tpu.solver.augmented import build_augmented, build_terminal_factors
from timeopt_tpu.solver.horizon import (
    LFTElements,
    lft_elements,
    lft_prefix_scan,
    propagator_J_curve_factored,
)


def _batched_blocks(rng, B=8, n=3, m=2, N=6, dtype=np.float32):
    """Build B random LTV problems' augmented blocks + terminal factors."""
    systems_blocks = []
    for i in range(B):
        step, prob, Ad, Bd, X, U = random_ltv_problem(rng, n=n, m=m, N=N)
        system = System(name=f"ltv{i}", n=n, m=m, dt=0.1, step=step)
        A = jnp.broadcast_to(jnp.asarray(Ad, dtype), (N, n, n))
        Bm = jnp.broadcast_to(jnp.asarray(Bd, dtype), (N, n, m))
        Xj = jnp.asarray(X, dtype)
        Uj = jnp.asarray(U, dtype)
        prob32 = jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            prob,
        )
        blocks = build_augmented(system, prob32, Xj, Uj, A, Bm, psd_levels=1)
        C = build_terminal_factors(prob32, Xj, s=blocks.s)
        systems_blocks.append((blocks, C))
    stack = lambda xs: jnp.stack(xs, 0)
    A_aug = stack([b.A_aug for b, _ in systems_blocks])
    B_aug = stack([b.B_aug for b, _ in systems_blocks])
    Q_aug = stack([b.Q_aug for b, _ in systems_blocks])
    R_inv = stack([b.R_inv for b, _ in systems_blocks])
    C = stack([c for _, c in systems_blocks])
    return A_aug, B_aug, Q_aug, R_inv, C


def test_fused_select_lanes_matches_xla(rng):
    A_aug, B_aug, Q_aug, R_inv, C = _batched_blocks(rng)

    # XLA reference
    def one(a, b, q, r, c):
        from timeopt_tpu.solver.augmented import AugmentedBlocks

        blocks = AugmentedBlocks(A_aug=a, B_aug=b, Q_aug=q, R_inv=r)
        pre = lft_prefix_scan(
            lft_elements(blocks, psd_levels=1), mode="sequential", psd_levels=1
        )
        return propagator_J_curve_factored(pre, c, psd_levels=1)

    J_ref = jax.vmap(one)(A_aug, B_aug, Q_aug, R_inv, C)

    J_pallas = propagator_select_lanes(
        A_aug, B_aug, Q_aug, R_inv, C, block_b=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(J_pallas), np.asarray(J_ref), rtol=2e-3, atol=1e-4
    )


def test_scan_lanes_matches_prefix_scan(rng):
    A_aug, B_aug, Q_aug, R_inv, C = _batched_blocks(rng, B=8)
    BRB = jnp.einsum("bnim,bmo,bnjo->bnij", B_aug, R_inv, B_aug)
    At, Qt, BRBt = (jnp.transpose(x, (1, 2, 3, 0)) for x in (A_aug, Q_aug, BRB))
    E, F, G = lft_scan_lanes(At, Qt, BRBt, block_b=8, interpret=True)

    def one(a, b, q, r):
        from timeopt_tpu.solver.augmented import AugmentedBlocks

        blocks = AugmentedBlocks(A_aug=a, B_aug=b, Q_aug=q, R_inv=r)
        return lft_prefix_scan(
            lft_elements(blocks, psd_levels=1), mode="sequential", psd_levels=1
        )

    ref = jax.vmap(one)(A_aug, B_aug, Q_aug, R_inv)
    np.testing.assert_allclose(
        np.transpose(np.asarray(E), (3, 0, 1, 2)), np.asarray(ref.E), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(G), (3, 0, 1, 2)), np.asarray(ref.G), rtol=2e-3, atol=1e-4
    )


def test_fused_select_df_matches_xla_loose(rng):
    """df32 fused kernel in interpret mode: loose f32-level tolerance
    (interpret degrades the double-single tricks; exactness is verified on
    real TPU hardware). Also checks the T_min query gating (+inf below)."""
    from timeopt_tpu.ops.pallas_lft import propagator_select_lanes_df

    A_aug, B_aug, Q_aug, R_inv, C = _batched_blocks(rng)

    def one(a, b, q, r, c):
        from timeopt_tpu.solver.augmented import AugmentedBlocks

        blocks = AugmentedBlocks(A_aug=a, B_aug=b, Q_aug=q, R_inv=r)
        pre = lft_prefix_scan(
            lft_elements(blocks, psd_levels=1), mode="sequential", psd_levels=1
        )
        return propagator_J_curve_factored(pre, c, psd_levels=1)

    J_ref = np.asarray(jax.vmap(one)(A_aug, B_aug, Q_aug, R_inv, C))
    J_df = np.asarray(
        propagator_select_lanes_df(
            A_aug, B_aug, Q_aug, R_inv, C, block_b=8, t_min=3, interpret=True
        )
    )
    assert np.all(np.isinf(J_df[:, :2]))
    np.testing.assert_allclose(J_df[:, 2:], J_ref[:, 2:], rtol=5e-3, atol=1e-3)


def test_generic_dense_trisym_matches_lanes(rng):
    """Generic dense-tile kernel (k-varying Q_aug path) vs the lanes
    kernel, trisym on and off. trisym=False runs the identical op sequence
    (bitwise on TPU hardware); trisym computes symmetric congruences
    triangle-only (f32-ulp agreement). Both loose on compiled CPU
    (ops/df32.py backend caveat)."""
    from timeopt_tpu.ops.pallas_lft import (
        propagator_select_dense_df,
        propagator_select_lanes_df,
    )

    A_aug, B_aug, Q_aug, R_inv, C = _batched_blocks(rng)
    J_l = np.asarray(
        propagator_select_lanes_df(
            A_aug, B_aug, Q_aug, R_inv, C, block_b=8, t_min=3, interpret=True
        )
    )
    for tri in (False, True):
        J_d = np.asarray(
            propagator_select_dense_df(
                A_aug, B_aug, Q_aug, R_inv, C, tile=(2, 4), t_min=3,
                trisym=tri, interpret=True,
            )
        )
        assert np.all(np.isinf(J_d[:, :2]))
        np.testing.assert_allclose(J_d[:, 2:], J_l[:, 2:], rtol=1e-3, atol=1e-3)
