"""Pallas LFT-scan kernel vs the XLA sequential scan (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timeopt_tpu.ops.pallas_lft import lft_prefix_scan_lanes
from timeopt_tpu.solver.horizon import LFTElements, lft_prefix_scan


def _random_elems(rng, N, p, B, dtype=np.float32):
    H = rng.standard_normal((N, B, p, p)).astype(dtype) * 0.1
    E = H @ np.swapaxes(H, -1, -2) + np.eye(p, dtype=dtype)
    F = rng.standard_normal((N, B, p, p)).astype(dtype) * 0.1
    H2 = rng.standard_normal((N, B, p, p)).astype(dtype) * 0.3
    G = H2 @ np.swapaxes(H2, -1, -2)
    return E, F, G


def test_pallas_scan_matches_xla(rng):
    N, p, B = 7, 5, 16
    E, F, G = _random_elems(rng, N, p, B)

    # XLA reference: vmap the per-problem sequential scan over the batch
    ref = jax.vmap(
        lambda e, f, g: lft_prefix_scan(
            LFTElements(E=e, F=f, G=g), mode="sequential", psd_levels=1
        )
    )(
        jnp.asarray(np.swapaxes(E, 0, 1)),
        jnp.asarray(np.swapaxes(F, 0, 1)),
        jnp.asarray(np.swapaxes(G, 0, 1)),
    )  # leaves (B, N, p, p)

    Et = jnp.asarray(np.transpose(E, (0, 2, 3, 1)))  # (N, p, p, B)
    Ft = jnp.asarray(np.transpose(F, (0, 2, 3, 1)))
    Gt = jnp.asarray(np.transpose(G, (0, 2, 3, 1)))
    Eo, Fo, Go = lft_prefix_scan_lanes(Et, Ft, Gt, block_b=8, interpret=True)

    for got, want in zip(
        (Eo, Fo, Go), (ref.E, ref.F, ref.G)
    ):
        got_bnpp = np.transpose(np.asarray(got), (3, 0, 1, 2))
        np.testing.assert_allclose(got_bnpp, np.asarray(want), rtol=2e-4, atol=2e-5)
