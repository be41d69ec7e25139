"""Fused Pallas TPU kernel for the batched LFT prefix scan.

Why: under `vmap`, the prefix composition is a 160-step `lax.scan` whose body
is ~50 small ops on (B, p, p) arrays with p ≈ 13. On TPU the minor two dims
tile to (8/16 sublanes, 128 lanes), so every HBM round-trip moves ~10x the
logical bytes (13 of 128 lanes used) — measured ~173 ms per scan at B=1024,
~100x off the bandwidth bound. This kernel:

- keeps the running prefix (E,F,G) in VMEM scratch across the whole scan
  (zero intermediate HBM traffic),
- lays the *batch* on the lane axis ((p, p, B_tile) blocks, B_tile = 128
  lanes fully dense),
- runs matrix products and the pivot-free Gauss-Jordan inverse as unrolled
  broadcasted FMAs over (p, 2p, B_tile) values (pure VPU work),
- streams per-step inputs/outputs through the automatic Pallas grid
  pipeline: grid = (B_tiles, N), sequential N innermost, carry persisting
  across grid steps (the canonical TPU sequential-scan pattern).

The kernel is numerically identical to timeopt_tpu.solver.horizon's
sequential scan (same compose, same jitter) — tested in interpret mode on
CPU and against the XLA path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _eye_lanes(p: int, b: int, dtype) -> jax.Array:
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, p, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (p, p, b), 1)
    return (rows == cols).astype(dtype)


def _mm(A, B, p):
    """C[i,j,b] = sum_k A[i,k,b] B[k,j,b] — unrolled broadcasted FMAs."""
    return sum(A[:, k : k + 1, :] * B[k : k + 1, :, :] for k in range(p))


def _mm_at_b(A, B, p):
    """C[i,j,b] = sum_k A[k,i,b] B[k,j,b] = (A^T B)."""
    return sum(A[k : k + 1, :, :].swapaxes(0, 1) * B[k : k + 1, :, :] for k in range(p))


def _mm_a_bt(A, B, p):
    """C[i,j,b] = sum_k A[i,k,b] B[j,k,b] = (A B^T)."""
    return sum(A[:, k : k + 1, :] * B[:, k : k + 1, :].swapaxes(0, 1) for k in range(p))


def _sym(A):
    return 0.5 * (A + A.swapaxes(0, 1))


def _inv_lanes(A, p: int, jitter: float):
    """Pivot-free Gauss-Jordan inverse of (p, p, b) + jitter*I, batched over
    lanes; row-list formulation (no dynamic-update-slice)."""
    b = A.shape[-1]
    eye = _eye_lanes(p, b, A.dtype)
    M = jnp.concatenate([A + jitter * eye, eye], axis=1)  # (p, 2p, b)
    rows = [M[i] for i in range(p)]  # each (2p, b)
    for i in range(p):
        r = rows[i] / rows[i][i][None, :]
        new_rows = []
        for j in range(p):
            if j == i:
                new_rows.append(r)
            else:
                new_rows.append(rows[j] - rows[j][i][None, :] * r)
        rows = new_rows
    return jnp.stack([rows[i][p:] for i in range(p)], axis=0)  # (p, p, b)


def _lft_scan_kernel(e_ref, f_ref, g_ref, eo_ref, fo_ref, go_ref, cE, cF, cG, *, p, jitter):
    k = pl.program_id(1)
    Ek = e_ref[0]
    Fk = f_ref[0]
    Gk = g_ref[0]

    @pl.when(k == 0)
    def _():
        cE[:] = Ek
        cF[:] = Fk
        cG[:] = Gk

    @pl.when(k > 0)
    def _():
        # compose(prefix, elem_k): W = (E_k + G_prefix)^-1
        W = _inv_lanes(Ek + cG[:], p, jitter)
        F1 = cF[:]
        F1W = _mm(F1, W, p)
        Enew = _sym(cE[:] - _mm_a_bt(F1W, F1, p))
        Fnew = _mm(F1W, Fk, p)
        WFk = _mm(W, Fk, p)
        Gnew = _sym(Gk - _mm_at_b(Fk, WFk, p))
        cE[:] = Enew
        cF[:] = Fnew
        cG[:] = Gnew

    eo_ref[0] = cE[:]
    fo_ref[0] = cF[:]
    go_ref[0] = cG[:]


def lft_prefix_scan_lanes(
    E: jax.Array,
    F: jax.Array,
    G: jax.Array,
    *,
    jitter: float = 1e-9,
    block_b: int = 128,
    interpret: bool = False,
):
    """All LFT prefix compositions, batched over lanes.

    E, F, G: (N, p, p, B) with B a multiple of block_b. Returns prefixes of
    the same shape. Equivalent to vmapping
    timeopt_tpu.solver.horizon.lft_prefix_scan(mode="sequential") over the
    trailing batch axis (with psd_levels=1).
    """
    N, p, _, B = E.shape
    assert B % block_b == 0, (B, block_b)
    grid = (B // block_b, N)

    spec = pl.BlockSpec(
        (1, p, p, block_b), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_lft_scan_kernel, p=p, jitter=jitter)
    out_shape = jax.ShapeDtypeStruct(E.shape, E.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((p, p, block_b), E.dtype),
            pltpu.VMEM((p, p, block_b), E.dtype),
            pltpu.VMEM((p, p, block_b), E.dtype),
        ],
        interpret=interpret,
    )(E, F, G)
