"""Fused Pallas TPU kernels for the batched propagator sweep.

Why: under `vmap`, the propagator select is dominated by chains of small ops
on (B, p, p) arrays with p ≈ 13. On TPU the minor two dims tile to (8/16
sublanes, 128 lanes), so every HBM round-trip moves ~10x the logical bytes
(13 of 128 lanes used) — measured 173 ms for the 160-step prefix scan at
B=1024, ~100x off the bandwidth bound. These kernels:

- lay the *batch* on the lane axis ((p, p, B_tile) blocks, B_tile = 128
  lanes fully dense),
- run matrix products and the pivot-free Gauss-Jordan inverse as unrolled
  broadcasted FMAs over (p, 2p, B_tile) values (pure VPU work),
- keep the running prefix (E,F,G) in VMEM scratch across the whole scan
  (zero intermediate HBM traffic) and compute the per-step LFT elements
  E = Q^-1, F = E A', G = A E A' + B R^-1 B' inline from the streamed
  augmented blocks,
- stream inputs/outputs through the automatic Pallas grid pipeline:
  grid = (B_tiles, N), sequential N innermost, carry persisting across grid
  steps (the canonical TPU sequential-scan pattern).

Numerics match timeopt_tpu.solver.horizon's XLA path (psd_levels=1) —
tested in interpret mode on CPU and against the XLA path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timeopt_tpu.ops.precision import full_matmul_precision


# =============================================================================
# Lanes-layout building blocks (arrays are (rows, cols, lanes) values)
# =============================================================================


def _eye_lanes(p: int, b, dtype) -> jax.Array:
    """(p, p) + batch-shape identity; `b` an int (lanes layout) or a shape
    tuple (dense-tile layout, kernel 5)."""
    bshape = (b,) if isinstance(b, int) else tuple(b)
    shape = (p, p) + bshape
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (rows == cols).astype(dtype)


def _mm(A, B):
    """C[i,j,b] = sum_k A[i,k,b] B[k,j,b]; shapes (a,k,b) x (k,c,b)."""
    kdim = A.shape[1]
    return sum(A[:, k : k + 1, :] * B[k : k + 1, :, :] for k in range(kdim))


def _mm_at_b(A, B):
    """C[i,j,b] = sum_k A[k,i,b] B[k,j,b] = A^T B; shapes (k,a,b) x (k,c,b)."""
    kdim = A.shape[0]
    return sum(A[k : k + 1, :, :].swapaxes(0, 1) * B[k : k + 1, :, :] for k in range(kdim))


def _mm_a_bt(A, B):
    """C[i,j,b] = sum_k A[i,k,b] B[j,k,b] = A B^T; shapes (a,k,b) x (c,k,b)."""
    kdim = A.shape[1]
    return sum(A[:, k : k + 1, :] * B[:, k : k + 1, :].swapaxes(0, 1) for k in range(kdim))


def _sym(A):
    return 0.5 * (A + A.swapaxes(0, 1))


def _inv_lanes(A, jitter: float):
    """Pivot-free Gauss-Jordan inverse of (p, p, *b) + jitter*I, batched over
    the trailing batch axes (a single lanes axis or the dense-tile
    (sublane, lane) pair); row-list formulation (no dynamic-update-slice)."""
    p = A.shape[0]
    eye = _eye_lanes(p, A.shape[2:], A.dtype)
    M = jnp.concatenate([A + jitter * eye, eye], axis=1)  # (p, 2p, *b)
    rows = [M[i] for i in range(p)]  # each (2p, *b)
    for i in range(p):
        r = rows[i] / rows[i][i][None]
        new_rows = []
        for j in range(p):
            if j == i:
                new_rows.append(r)
            else:
                new_rows.append(rows[j] - rows[j][i][None] * r)
        rows = new_rows
    return jnp.stack([rows[i][p:] for i in range(p)], axis=0)  # (p, p, *b)


def _elements(Ak, Qk, BRBk, jitter):
    """LFT element from augmented blocks: E = Q^-1, F = E A', G = A E A' + BRB'."""
    E = _inv_lanes(Qk, jitter)
    F = _mm_a_bt(E, Ak)  # E A'
    G = _sym(_mm(Ak, F) + BRBk)
    return E, F, G


# =============================================================================
# Kernel 1: fused elements + prefix scan
# =============================================================================


def _lft_scan_kernel(a_ref, q_ref, brb_ref, eo_ref, fo_ref, go_ref, cE, cF, cG, *, jitter):
    k = pl.program_id(1)
    Ek, Fk, Gk = _elements(a_ref[0], q_ref[0], brb_ref[0], jitter)

    @pl.when(k == 0)
    def _():
        cE[:] = Ek
        cF[:] = Fk
        cG[:] = Gk

    @pl.when(k > 0)
    def _():
        # compose(prefix, elem_k): W = (E_k + G_prefix)^-1
        W = _inv_lanes(Ek + cG[:], jitter)
        F1 = cF[:]
        F1W = _mm(F1, W)
        Enew = _sym(cE[:] - _mm_a_bt(F1W, F1))
        Fnew = _mm(F1W, Fk)
        WFk = _mm(W, Fk)
        Gnew = _sym(Gk - _mm_at_b(Fk, WFk))
        cE[:] = Enew
        cF[:] = Fnew
        cG[:] = Gnew

    eo_ref[0] = cE[:]
    fo_ref[0] = cF[:]
    go_ref[0] = cG[:]


def lft_scan_lanes(
    A_aug: jax.Array,
    Q_aug: jax.Array,
    BRB: jax.Array,
    *,
    jitter: float = 1e-9,
    block_b: int = 128,
    interpret: bool = False,
):
    """Fused LFT elements + prefix scan, batched over lanes.

    A_aug, Q_aug, BRB (= B_aug R^-1 B_aug'): (N, p, p, B), B % block_b == 0.
    Returns prefix (E, F, G) of the same shape. Equivalent to
    lft_prefix_scan(lft_elements(...), mode="sequential") with psd_levels=1.
    """
    N, p, _, B = A_aug.shape
    assert B % block_b == 0, (B, block_b)
    grid = (B // block_b, N)

    spec = pl.BlockSpec(
        (1, p, p, block_b), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_lft_scan_kernel, jitter=jitter)
    out_shape = jax.ShapeDtypeStruct(A_aug.shape, A_aug.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((p, p, block_b), A_aug.dtype),
            pltpu.VMEM((p, p, block_b), A_aug.dtype),
            pltpu.VMEM((p, p, block_b), A_aug.dtype),
        ],
        interpret=interpret,
    )(A_aug, Q_aug, BRB)


# =============================================================================
# Kernel 2: factored terminal queries
# =============================================================================


def _query_kernel(e_ref, f_ref, g_ref, c_ref, j_ref, *, jitter):
    E = e_ref[0]  # (p, p, bt)
    F = f_ref[0]
    G = g_ref[0]
    C = c_ref[0]  # (n, p, bt)
    n = C.shape[0]
    p = E.shape[0]
    b = E.shape[-1]

    # S = I_n + C G C'
    CG = _mm(C, G)  # (n, p, bt)
    S = _eye_lanes(n, b, E.dtype) + _mm_a_bt(CG, C)
    Sinv = _inv_lanes(S, 0.0)
    FCt = _mm_a_bt(F, C)  # (p, n, bt)
    Z = _mm(FCt, Sinv)  # (p, n, bt)
    X0 = _sym(E - _mm_a_bt(Z, FCt))
    X0inv = _inv_lanes(X0, jitter)
    j_ref[0, 0, :] = 0.5 * X0inv[p - 1, p - 1, :]


def lft_query_lanes(
    E: jax.Array,
    F: jax.Array,
    G: jax.Array,
    C: jax.Array,
    *,
    jitter: float = 1e-9,
    block_b: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Factored terminal queries, batched over lanes.

    E, F, G: (N, p, p, B) prefixes; C: (N, n, p, B) terminal factors.
    Returns J: (N, B). Equivalent to propagator_J_curve_factored with
    psd_levels=1 (one n-dim SPD solve + one p-dim solve per query)."""
    N, p, _, B = E.shape
    n = C.shape[1]
    assert B % block_b == 0, (B, block_b)
    grid = (B // block_b, N)

    mat = pl.BlockSpec(
        (1, p, p, block_b), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec(
        (1, n, p, block_b), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM
    )
    # J is emitted as (N, 1, B) so the minor-two block dims satisfy the
    # Mosaic (sublane, lane) tiling constraint; squeezed on return.
    jspec = pl.BlockSpec((1, 1, block_b), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM)

    kernel = functools.partial(_query_kernel, jitter=jitter)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat, mat, mat, cspec],
        out_specs=jspec,
        out_shape=jax.ShapeDtypeStruct((N, 1, B), E.dtype),
        interpret=interpret,
    )(E, F, G, C)
    return out[:, 0, :]


# =============================================================================
# Full select in lanes layout
# =============================================================================


@full_matmul_precision
def propagator_select_lanes(
    A_aug: jax.Array,
    B_aug: jax.Array,
    Q_aug: jax.Array,
    R_inv: jax.Array,
    C: jax.Array,
    *,
    jitter: float = 1e-9,
    block_b: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Whole propagator selection on a problem batch, batch-leading layout.

    A_aug, B_aug, Q_aug: (B, N, p, p) / (B, N, p, m); R_inv: (B, m, m);
    C: (B, N, n, p). Returns J: (B, N). Transposes to lanes layout once at
    the boundary, runs the two fused kernels, transposes the (tiny) J back.
    """
    BRB = jnp.einsum("bnim,bmo,bnjo->bnij", B_aug, R_inv, B_aug)
    At, Qt, BRBt = (jnp.transpose(x, (1, 2, 3, 0)) for x in (A_aug, Q_aug, BRB))
    Ct = jnp.transpose(C, (1, 2, 3, 0))
    E, F, G = lft_scan_lanes(
        At, Qt, BRBt, jitter=jitter, block_b=block_b, interpret=interpret
    )
    J = lft_query_lanes(
        E, F, G, Ct, jitter=jitter, block_b=block_b, interpret=interpret
    )
    return jnp.transpose(J, (1, 0))


# =============================================================================
# Kernel 3 (default): fully-fused double-single select
# elements + compose + terminal query per step, J-only output
# =============================================================================


def _df_select_step(
    Ak, Qk, BRBk, Ck, j_ref, cEh, cEl, cFh, cFl, cGh, cGl, *, jitter, t_min,
    trisym=False,
):
    """Per-step body of the generic df32 select kernel: build the LFT element
    for step k from the (p, p, bt) augmented blocks via an LDL' of Q_aug
    (valid for arbitrary, k-varying Q_aug — e.g. extra_stage_cost Taylor
    terms), then compose + query via _df_compose_query. All in double-single
    (df32) arithmetic (fp32 alone corrupts the J(T) argmin; see
    timeopt_tpu/ops/df32.py). Math shared with the XLA latency-mode select
    via ops/lft_df.py."""
    from timeopt_tpu.ops.lft_df import df_lft_element_ldl

    E, F, G = df_lft_element_ldl(Ak, Qk, BRBk, jitter=jitter, trisym=trisym)

    _df_compose_query(
        E, F, G, Ck, j_ref, cEh, cEl, cFh, cFl, cGh, cGl,
        jitter=jitter, t_min=t_min, trisym=trisym,
    )


def _df_compose(E, F, G, cEh, cEl, cFh, cFl, cGh, cGl, *, jitter, trisym=False):
    """Compose the step-k LFT element (E, F, G) onto the VMEM-resident df32
    prefix carry; returns the updated prefix (also written back to VMEM)."""
    from timeopt_tpu.ops.lft_df import df_lft_compose

    k = pl.program_id(1)

    # Compose unconditionally on the (garbage-at-k==0) carry and select the
    # raw element where k == 0. Branchless on purpose: a predicated write to
    # scratch followed by a read in the same grid step proved unreliable
    # (the later query read a stale carry), and the wasted compose at k == 0
    # is one step in N.
    is0 = k == 0
    cE = (cEh[:], cEl[:])
    cF = (cFh[:], cFl[:])
    cG = (cGh[:], cGl[:])
    # W = (E + Ḡ)^-1 via LDL'; W never formed (see ops/lft_df.df_lft_compose,
    # the shared math with the XLA latency-mode associative select)
    Ec, Fc, Gc = df_lft_compose((cE, cF, cG), (E, F, G), jitter=jitter, trisym=trisym)

    def sel(a, b):
        return (jnp.where(is0, a[0], b[0]), jnp.where(is0, a[1], b[1]))

    Ep = sel(E, Ec)
    Fp = sel(F, Fc)
    Gp = sel(G, Gc)
    cEh[:], cEl[:] = Ep
    cFh[:], cFl[:] = Fp
    cGh[:], cGl[:] = Gp
    return Ep, Fp, Gp


def _df_query_lastpivot(X0, j_ref, *, jitter):
    """J = 0.5 (X0^-1)[p-1, p-1] — shared math in ops/lft_df.py."""
    from timeopt_tpu.ops.lft_df import df_lft_query_lastpivot

    j_ref[0, 0] = df_lft_query_lastpivot(X0, jitter=jitter)


def _df_compose_query(
    E, F, G, Ck, j_ref, cEh, cEl, cFh, cFl, cGh, cGl, *, jitter, t_min,
    trisym=False,
):
    """Compose + factored terminal query in the generic C-form (C the
    (n, p) terminal factor): S = I + C G C', X0 = E - FC' S^-1 CF'."""
    from timeopt_tpu.ops import df32 as dfm
    from timeopt_tpu.ops.lft_df import df_lft_query_factored

    k = pl.program_id(1)
    bshape = E[0].shape[2:]

    Ep, Fp, Gp = _df_compose(
        E, F, G, cEh, cEl, cFh, cFl, cGh, cGl, jitter=jitter, trisym=trisym
    )

    # horizons below T_min never reach the argmin window — skip their queries
    @pl.when(k + 1 >= t_min)
    def _():
        j_ref[0, 0] = df_lft_query_factored(
            (Ep, Fp, Gp), dfm.df_mat(Ck), jitter=jitter, trisym=trisym
        )

    @pl.when(k + 1 < t_min)
    def _():
        j_ref[0, 0] = jnp.full(bshape, jnp.inf, E[0].dtype)


def _f32_query_w0(Ep, Fp, Gp, etil, W0h, *, jitter):
    """Plain-f32 terminal query in the Lt-cancelled W0 form (hi parts only).

    Mixed-precision lever (round 5): the query feeds ONLY j_ref — its error
    never enters the df32 prefix carry, so unlike the compose chain it does
    not compound over the N steps. An f32 query perturbs each J(T) value by
    ~kappa * eps_f32 relative (kappa ~ 1e4..1e5 through the two inversions)
    — whether that moves any argmin on real problem sets is an empirical
    question settled on hardware against the f64 oracle
    (scripts/mixedprec_probe.py / oracle_match OM_QUERY=f32). Cost: the
    query's ~3.8k df terms (~25% of the step) collapse to ~2 f32 ops each.

    VERDICT (round 5, hardware): measured DEAD END for the default path —
    the per-T noise is independent across T, so flat hover-tail argmins
    scramble (final T* match 409/1024 vs production at B=1024 quadrotor;
    all flips cost-equivalent ties, but the advertised north star is
    exact match). Kept as an opt-in knob only; see docs/DESIGN.md §5.

    Same math as _df_compose_query_w0's df branch: M = G11 + e g' + g e' +
    g22 e e', K = W0 + M, X0 = Ep - FEt K^-1 FEt', J = 0.5 (X0^-1)[p-1,p-1].
    """
    Eh, Fh, Gh = Ep[0], Fp[0], Gp[0]
    p = Eh.shape[0]
    n = etil.shape[0]

    G11 = Gh[:n, :n]
    g = Gh[:n, n:]  # (n, 1, bt)
    g22 = Gh[n:, n:]  # (1, 1, bt)
    eg = etil * g.swapaxes(0, 1)  # (n, n, bt) = e g'
    ee = (etil * g22) * etil.swapaxes(0, 1)
    M = G11 + eg + eg.swapaxes(0, 1) + ee
    K = W0h + M
    Kinv = _inv_lanes(K, 0.0)
    FEt = Fh[:, :n] + Fh[:, n:] * etil.swapaxes(0, 1)  # (p, n, bt)
    X0 = _sym(Eh - _mm(_mm(FEt, Kinv), FEt.swapaxes(0, 1)))
    X0inv = _inv_lanes(X0, jitter)
    return 0.5 * X0inv[p - 1, p - 1]


def _df_compose_query_w0(
    E, F, G, etil, W0, j_ref, cEh, cEl, cFh, cFl, cGh, cGl, *, jitter, t_min,
    trisym=False, query_df=True,
):
    """Compose + terminal query in the Lt-cancelled form (default fused path).

    With C = Lt [I | ẽ] (Lt the k-constant terminal Cholesky factor,
    ẽ = e_{k+1}/s_{k+1}), push-through gives

        C' (I + C G C')^-1 C = Ẽ' (W0 + Ẽ G Ẽ')^-1 Ẽ,
        W0 = (Lt' Lt)^-1 = (Qf + rho I)^-1   (k-constant, precomputed df32)

    — the Lt factors cancel exactly, so the three (n x p)-by-(p x ~) matmuls
    of the generic C-form collapse to rank-1 updates:

        Ẽ G Ẽ' = G11 + ẽ g' + g ẽ' + g22 ẽ ẽ'   (G11 = G[:n,:n], g = G[:n,n])
        F Ẽ'   = F[:, :n] + F[:, n] ẽ'

    etil: (n, 1, bt) f32;  W0: df32 (n, n, bt) pair."""
    from timeopt_tpu.ops import df32 as dfm

    k = pl.program_id(1)
    p = E[0].shape[0]
    n = etil.shape[0]
    bshape = E[0].shape[2:]

    Ep, Fp, Gp = _df_compose(
        E, F, G, cEh, cEl, cFh, cFl, cGh, cGl, jitter=jitter, trisym=trisym
    )

    if not query_df:

        @pl.when(k + 1 >= t_min)
        def _():
            j_ref[0, 0] = _f32_query_w0(Ep, Fp, Gp, etil, W0[0], jitter=jitter)

        @pl.when(k + 1 < t_min)
        def _():
            j_ref[0, 0] = jnp.full(bshape, jnp.inf, E[0].dtype)

        return

    @pl.when(k + 1 >= t_min)
    def _():
        ed = dfm.df_mat(etil)  # (n, 1, bt)
        G11 = (Gp[0][:n, :n], Gp[1][:n, :n])
        g = (Gp[0][:n, n:], Gp[1][:n, n:])  # (n, 1, bt)
        g22 = (Gp[0][n:, n:], Gp[1][n:, n:])  # (1, 1, bt)
        # M = G11 + ẽ g' + (ẽ g')' + g22 ẽ ẽ'  (exactly symmetric assembly)
        eg = dfm.df_matmul_nt(ed, g)  # (n, n, bt) = ẽ g'
        egt = (eg[0].swapaxes(0, 1), eg[1].swapaxes(0, 1))
        ee = dfm.df_matmul_nt(dfm.df_mul(ed, g22), ed)
        M = dfm.df_add(dfm.df_add(G11, dfm.df_add(eg, egt)), ee)
        K = dfm.df_add(W0, M)  # SPD (n, n, bt)
        Lk, dk, idk = dfm.df_ldl(K, 0.0, _eye_lanes(n, bshape, E[0].dtype))
        # FẼ' = F[:, :n] + F[:, n] ẽ'  (p, n, bt)
        Fn = (Fp[0][:, :n], Fp[1][:, :n])
        fcol = (Fp[0][:, n:], Fp[1][:, n:])  # (p, 1, bt)
        FEt = dfm.df_add(Fn, dfm.df_matmul_nt(fcol, ed))
        # X0 = Ep - FẼ' K^-1 ẼF' = Ep - Vq' Dk^-1 Vq,  Vq = Lk^-1 (FẼ')'
        Vq = dfm.df_trisolve_unit_lower_bt(Lk, FEt)
        Vqs = dfm.df_scale_rows(Vq, idk)
        if trisym:
            X0 = dfm.df_sub(Ep, dfm.df_matmul_tn_trisym(Vq, Vqs))
        else:
            X0 = dfm.df_sym_half(dfm.df_sub(Ep, dfm.df_matmul_tn(Vq, Vqs)))
        _df_query_lastpivot(X0, j_ref, jitter=jitter)

    @pl.when(k + 1 < t_min)
    def _():
        j_ref[0, 0] = jnp.full(bshape, jnp.inf, E[0].dtype)


def _df_select_kernel(
    a_ref, q_ref, brb_ref, c_ref, j_ref, cEh, cEl, cFh, cFl, cGh, cGl,
    *, jitter, t_min, trisym=False,
):
    """df32 select on pre-assembled augmented blocks (the generic path for
    k-varying Q_aug, e.g. extra_stage_cost; the fused kernel below
    assembles the blocks in-kernel for the stationary stage cost)."""
    _df_select_step(
        a_ref[0], q_ref[0], brb_ref[0], c_ref[0], j_ref,
        cEh, cEl, cFh, cFl, cGh, cGl, jitter=jitter, t_min=t_min, trisym=trisym,
    )


@full_matmul_precision
def propagator_select_lanes_df(
    A_aug: jax.Array,
    B_aug: jax.Array,
    Q_aug: jax.Array,
    R_inv: jax.Array,
    C: jax.Array,
    *,
    jitter: float = 1e-9,
    block_b: int = 128,
    t_min: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Whole propagator selection on a problem batch in double-single
    precision — the default TPU path (f64-quality J(T) from fp32 inputs and
    fp32 hardware; input rounding to fp32 is measured harmless while fp32
    arithmetic is not).

    A_aug, Q_aug: (B, N, p, p); B_aug: (B, N, p, m); R_inv: (B, m, m);
    C: (B, N, n, p). Returns J: (B, N) with +inf below t_min.
    """
    BRB = jnp.einsum("bnim,bmo,bnjo->bnij", B_aug, R_inv, B_aug)
    At, Qt, BRBt = (jnp.transpose(x, (1, 2, 3, 0)) for x in (A_aug, Q_aug, BRB))
    Ct = jnp.transpose(C, (1, 2, 3, 0))

    N, p, _, B = At.shape
    n = Ct.shape[1]
    assert B % block_b == 0, (B, block_b)
    grid = (B // block_b, N)

    mat = pl.BlockSpec(
        (1, p, p, block_b), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec(
        (1, n, p, block_b), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM
    )
    jspec = pl.BlockSpec((1, 1, block_b), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM)

    kernel = functools.partial(_df_select_kernel, jitter=jitter, t_min=t_min)
    scratch = [pltpu.VMEM((p, p, block_b), At.dtype) for _ in range(6)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat, mat, mat, cspec],
        out_specs=jspec,
        out_shape=jax.ShapeDtypeStruct((N, 1, B), At.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(At, Qt, BRBt, Ct)
    return jnp.transpose(out[:, 0, :], (1, 0))


@full_matmul_precision
def propagator_select_dense_df(
    A_aug: jax.Array,
    B_aug: jax.Array,
    Q_aug: jax.Array,
    R_inv: jax.Array,
    C: jax.Array,
    *,
    jitter: float = 1e-9,
    tile: tuple = (8, 128),
    t_min: int = 1,
    trisym: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Generic (k-varying Q_aug) df32 selection, dense-tile batch layout.

    Same contract as propagator_select_lanes_df, batch packed into full
    (sublane, lane) tiles with matrix indices on untiled leading axes (see
    kernel 5 below for the layout rationale) — B % (tile[0]*tile[1]) == 0.
    trisym computes the symmetric congruences triangle-only (J agrees with
    the lanes kernel to f32 ulp; trisym=False is bit-identical to it)."""
    st, sl = tile
    tb = st * sl

    BRB = jnp.einsum("bnim,bmo,bnjo->bnij", B_aug, R_inv, B_aug)
    At, Qt, BRBt = (jnp.transpose(x, (1, 2, 3, 0)) for x in (A_aug, Q_aug, BRB))
    Ct = jnp.transpose(C, (1, 2, 3, 0))

    N, p, _, B = At.shape
    n = Ct.shape[1]
    assert B % tb == 0, (B, tile)
    grid = (B // tb, N)

    rt = lambda x: x.reshape(x.shape[:-1] + (B // sl, sl))  # noqa: E731

    mat = pl.BlockSpec(
        (1, p, p, st, sl), lambda i, k: (k, 0, 0, i, 0), memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec(
        (1, n, p, st, sl), lambda i, k: (k, 0, 0, i, 0), memory_space=pltpu.VMEM
    )
    jspec = pl.BlockSpec(
        (1, 1, st, sl), lambda i, k: (k, 0, i, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _df_select_kernel, jitter=jitter, t_min=t_min, trisym=trisym
    )
    scratch = [pltpu.VMEM((p, p, st, sl), At.dtype) for _ in range(6)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat, mat, mat, cspec],
        out_specs=jspec,
        out_shape=jax.ShapeDtypeStruct((N, 1, B // sl, sl), At.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rt(At), rt(Qt), rt(BRBt), rt(Ct))
    return jnp.transpose(out.reshape(N, B), (1, 0))


# =============================================================================
# Kernel 4 (default): fused assembly + double-single select.
# The (B, N, p, p) augmented blocks are never materialized: XLA pads the
# minor (13, 13) dims to (16, 128) tiles, so each such array costs ~10.7x
# its logical bytes in HBM traffic — assembling Q_aug/A_aug/BRB/C in-kernel
# from the raw (n,)-sized inputs removes ~6-10 padded tensors per select.
# =============================================================================


def _df_select_fused_kernel(
    a_ref, b_ref, vec_ref, scal_ref, iqh_ref, iql_ref, rinv_ref,
    w0h_ref, w0l_ref,
    j_ref, cEh, cEl, cFh, cFl, cGh, cGl, *, jitter, t_min, trisym=False,
    query_df=True, element_df=True,
):
    """Assemble the step-k augmented blocks from raw inputs (same arithmetic
    as solver/augmented.py build_augmented + build_terminal_factors, f32 —
    input assembly rounding is measured harmless, unlike the recursion), then
    build the LFT element via the *arrow* form of Q_aug^-1 and run the shared
    compose+query step.

    Arrow element: Q_aug + jitter I = [[Qq + jitter I, q], [q', c + jitter]]
    with q = Qe/s_k, c = corner/s_k^2, and Qq CONSTANT over time steps (the
    stage cost is time-invariant, /root/reference/augmented.py:31-37), so
    iQq = (Qq + jitter I)^-1 is precomputed once outside the kernel (df32
    pair iqh/iql, k-constant input) and the per-step inverse is a rank-1
    block update (the same Schur pivot sequence as the unpivoted LDL' it
    replaces — corner eliminated last):

        E = Q_aug^-1 = D + (1/s) u u',  D = blkdiag(iQq, 0),
        u = [w; -1],  w = iQq q,  s = (c + jitter) - q' w
        F = E A_aug'  = D A_aug' + (1/s) u (A_aug u)'
        G = A_aug E A_aug' + BRB = A_aug D A_aug' + (1/s) v v' + BRB,
        v = A_aug u

    This removes the per-step df32 LDL + two 26-wide trisolves of the generic
    path (~40% of the element flops; the generic kernel remains for k-varying
    Q_aug, i.e. extra_stage_cost).

    Refs: a (1,n,n,bt) dynamics Jacobian; b (1,n,m,bt); vec (1,4,n,bt) rows
    [e_k, e_{k+1}, atil_k, Q e_k]; scal (1,4,bt) rows [corner_k, 1/s_k,
    s_{k+1}, 1/s_{k+1}]; iqh/iql (n,n,bt) df32 pair of (Qq + jitter I)^-1;
    rinv (m,m,bt); w0h/w0l (n,n,bt) df32 pair of (Qf + rho I)^-1 (the
    Lt-cancelled terminal query — see _df_compose_query_w0)."""
    from timeopt_tpu.ops import df32 as dfm

    Ak = a_ref[0]  # (n, n, bt)
    Bk = b_ref[0]  # (n, m, bt)
    e_next = vec_ref[0, 1]  # (n, bt)
    atil = vec_ref[0, 2]
    Qe = vec_ref[0, 3]
    corner = scal_ref[0, 0]  # (bt,)
    inv_sk = scal_ref[0, 1]
    s_kp1 = scal_ref[0, 2]
    inv_skp1 = scal_ref[0, 3]
    iq = (iqh_ref[...], iql_ref[...])  # (n, n, bt) df32
    Rinv = rinv_ref[...]
    W0 = (w0h_ref[...], w0l_ref[...])  # (n, n, bt) df32
    n = Ak.shape[0]
    bshape = Ak.shape[2:]  # (bt,) lanes layout, (st, sl) dense-tile layout
    dtype = Ak.dtype

    # A_aug = [[A, atil/s_k], [0, s_{k+1}/s_k]]
    a_top = jnp.concatenate([Ak, (atil * inv_sk[None])[:, None]], axis=1)
    a_bot = jnp.concatenate(
        [jnp.zeros((1, n) + bshape, dtype), (s_kp1 * inv_sk)[None, None]], axis=1
    )
    A_aug = jnp.concatenate([a_top, a_bot], axis=0)  # (p, p, bt)
    A_df = dfm.df_mat(A_aug)

    # BRB = [[B R^-1 B', 0], [0, 0]]
    BR = _mm(Bk, Rinv)  # (n, m, bt)
    brb_n = _mm_a_bt(BR, Bk)  # (n, n, bt)
    if trisym:
        # mirror the lower triangle so BRB is exactly symmetric (the f32
        # row-sum products round asymmetrically); pure wiring — the old
        # path's G sym_half absorbed this
        from timeopt_tpu.ops.lft_df import _mirror_lower

        brb_n = _mirror_lower(brb_n)
    zcol = jnp.zeros((n, 1) + bshape, dtype)
    zrow = jnp.zeros((1, n + 1) + bshape, dtype)
    BRB = jnp.concatenate([jnp.concatenate([brb_n, zcol], axis=1), zrow], axis=0)

    # ẽ = e_{k+1}/s_{k+1} — the only k-varying part of the terminal factor
    etil = (e_next * inv_skp1[None])[:, None]  # (n, 1, bt)

    if not element_df:
        # Mixed-precision lever (round 5): build the step-k LFT element in
        # PLAIN f32 (hi parts only) and promote to df for the compose chain.
        # The element is a pure function of the step inputs, so its f32
        # arithmetic error acts as an input perturbation of the (df-exact)
        # composition — but amplified by kappa(Q_aug) ~ 1e4..1e5 through the
        # rank-1 inverse update, i.e. ~1e-3 relative — 4 orders larger than
        # rounding the inputs themselves. Whether that moves real argmins is
        # settled on hardware (scripts/mixedprec_probe.py). VERDICT
        # (round 5): measured DEAD END — benign on quadrotor e2e but a
        # genuine selection corruptor on stiff cases (oracle 351/640
        # exact, cartpole 0/128; docs/DESIGN.md §5). Opt-in knob only;
        # never routed.
        q32 = (Qe * inv_sk[None])[:, None]  # (n, 1, bt)
        iqh = iq[0]
        w32 = _mm(iqh, q32)  # (n, 1, bt)
        s32 = (corner * inv_sk * inv_sk + jitter)[None, None] - _mm_at_b(q32, w32)
        inv_s32 = 1.0 / s32  # (1, 1, bt)
        u32 = jnp.concatenate(
            [w32, -jnp.ones((1, 1) + bshape, dtype)], axis=0
        )  # (p, 1, bt)
        us = u32 * inv_s32
        # E = pad(iqh) + (1/s) u u'
        E32 = _sym(
            jnp.concatenate(
                [jnp.concatenate([iqh, zcol], axis=1), zrow], axis=0
            )
            + us * u32.swapaxes(0, 1)
        )
        A_left32 = A_aug[:, :n, :]  # (p, n, bt)
        DAt_top32 = _mm_a_bt(iqh, A_left32)  # (n, p, bt)
        v32 = _mm(A_aug, u32)  # (p, 1, bt)
        F32 = (
            jnp.concatenate([DAt_top32, zrow], axis=0)
            + us * v32.swapaxes(0, 1)
        )
        G32 = _sym(
            _mm(A_left32, DAt_top32) + (v32 * inv_s32) * v32.swapaxes(0, 1) + BRB
        )
        _df_compose_query_w0(
            dfm.df(E32), dfm.df(F32), dfm.df(G32), etil, W0, j_ref,
            cEh, cEl, cFh, cFl, cGh, cGl,
            jitter=jitter, t_min=t_min, trisym=trisym, query_df=query_df,
        )
        return

    # ---- arrow element
    q = (Qe * inv_sk[None])[:, None]  # (n, 1, bt) f32 (assembly rounding)
    q_df = dfm.df_mat(q)
    w = dfm.df_matmul(iq, q_df)  # (n, 1, bt)
    # s = (c + jitter) - q' w, jitter folded exactly (cf. df_ldl)
    ch, cl = dfm.two_sum(corner * inv_sk * inv_sk, jnp.asarray(jitter, dtype))
    qtw = dfm.df_matmul_tn(q_df, w)  # (1, 1, bt)
    s = dfm.df_sub((ch[None, None], cl[None, None]), qtw)
    inv_s = dfm.df_recip(s)  # (1, 1, bt)

    u = (
        jnp.concatenate([w[0], -jnp.ones((1, 1) + bshape, dtype)], axis=0),
        jnp.concatenate([w[1], jnp.zeros((1, 1) + bshape, dtype)], axis=0),
    )  # (p, 1, bt)
    u_s = dfm.df_mul(u, inv_s)

    # E = blkdiag(iQq, 0) + (1/s) u u'   (symmetric by construction: iq is
    # symmetrized host-side; trisym computes the rank-1 term from its
    # lower triangle, exactly symmetric)
    if trisym:
        uu = dfm.df_outer_trisym(u_s, u)  # (p, p, bt)
    else:
        uu = dfm.df_matmul_nt(u_s, u)  # (p, p, bt)
    pad = lambda M: jnp.concatenate(  # noqa: E731
        [jnp.concatenate([M, zcol], axis=1), zrow], axis=0
    )
    E = dfm.df_add((pad(iq[0]), pad(iq[1])), uu)

    # F = D A_aug' + (1/s) u v';  D A_aug' top rows = iQq (A_aug[:, :n])'
    A_left = A_aug[:, :n, :]  # (p, n, bt)
    DAt_top = dfm.df_matmul_nt(iq, dfm.df_mat(A_left))  # (n, p, bt)
    v = dfm.df_matmul(A_df, u)  # (p, 1, bt)
    uv = dfm.df_matmul_nt(u_s, v)  # (p, p, bt)
    DAt = (
        jnp.concatenate([DAt_top[0], zrow], axis=0),
        jnp.concatenate([DAt_top[1], zrow], axis=0),
    )
    F = dfm.df_add(DAt, uv)

    # G = A_aug D A_aug' + (1/s) v v' + BRB;  A_aug D A_aug' = A_left DAt_top
    v_s = dfm.df_mul(v, inv_s)
    if trisym:
        ADA = dfm.df_matmul_trisym(dfm.df_mat(A_left), DAt_top)  # (p, p, bt)
        vv = dfm.df_outer_trisym(v_s, v)
        # every addend exactly symmetric + elementwise df adds -> G exactly
        # symmetric without the sym_half pass
        G = dfm.df_add(dfm.df_add(ADA, vv), dfm.df_mat(BRB))
    else:
        ADA = dfm.df_matmul(dfm.df_mat(A_left), DAt_top)  # (p, p, bt)
        vv = dfm.df_matmul_nt(v_s, v)
        G = dfm.df_sym_half(dfm.df_add(dfm.df_add(ADA, vv), dfm.df_mat(BRB)))

    _df_compose_query_w0(
        E, F, G, etil, W0, j_ref, cEh, cEl, cFh, cFl, cGh, cGl,
        jitter=jitter, t_min=t_min, trisym=trisym, query_df=query_df,
    )


@full_matmul_precision
def propagator_select_lanes_df_fused(
    A: jax.Array,
    Bm: jax.Array,
    vecs: jax.Array,
    scal: jax.Array,
    Qq: jax.Array,
    R_inv: jax.Array,
    Lt: jax.Array,
    *,
    jitter: float = 1e-9,
    block_b: int = 128,
    t_min: int = 1,
    trisym: bool = False,
    query_df: bool = True,
    element_df: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused-assembly df32 propagator selection, batch-leading layout.

    A: (B, N, n, n); Bm: (B, N, n, m); vecs: (B, N, 4, n) rows
    [e_k, e_{k+1}, atil_k, Q e_k]; scal: (B, N, 4) rows [corner, 1/s_k,
    s_{k+1}, 1/s_{k+1}]; Qq: (B, n, n); R_inv: (B, m, m); Lt: (B, n, n).
    Returns J: (B, N) with +inf below t_min."""
    from timeopt_tpu.ops import df32 as dfm

    At = jnp.transpose(A, (1, 2, 3, 0))  # (N, n, n, B)
    Bt = jnp.transpose(Bm, (1, 2, 3, 0))
    Vt = jnp.transpose(vecs, (1, 2, 3, 0))  # (N, 4, n, B)
    St = jnp.transpose(scal, (1, 2, 0))  # (N, 4, B)
    Qqt = jnp.transpose(Qq, (1, 2, 0))  # (n, n, B)
    Rt = jnp.transpose(R_inv, (1, 2, 0))
    Ltt = jnp.transpose(Lt, (1, 2, 0))

    N, n, _, B = At.shape
    m = Bt.shape[2]
    p = n + 1
    assert B % block_b == 0, (B, block_b)
    grid = (B // block_b, N)

    # k-constant df32 inverses, computed once in XLA (same lanes layout, same
    # df arithmetic as in-kernel) and streamed as constant blocks:
    # iQq = (Qq + jitter I)^-1 for the arrow element, W0 = (Lt' Lt)^-1 =
    # (Qf + rho I)^-1 for the Lt-cancelled terminal query
    eye_n = _eye_lanes(n, B, At.dtype)
    iqh, iql = dfm.df_sym_half(dfm.df_gj_inv(dfm.df_mat(Qqt), jitter, eye_n))
    Qf_df = dfm.df_matmul_tn(dfm.df_mat(Ltt), dfm.df_mat(Ltt))
    w0h, w0l = dfm.df_sym_half(dfm.df_gj_inv(Qf_df, 0.0, eye_n))

    aspec = pl.BlockSpec((1, n, n, block_b), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, n, m, block_b), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 4, n, block_b), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 4, block_b), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM)
    # k-constant blocks: index map ignores k, so the pipeline fetches once
    cst = pl.BlockSpec((n, n, block_b), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((m, m, block_b), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM)
    jspec = pl.BlockSpec((1, 1, block_b), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _df_select_fused_kernel, jitter=jitter, t_min=t_min, trisym=trisym,
        query_df=query_df, element_df=element_df,
    )
    scratch = [pltpu.VMEM((p, p, block_b), At.dtype) for _ in range(6)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[aspec, bspec, vspec, sspec, cst, cst, rspec, cst, cst],
        out_specs=jspec,
        out_shape=jax.ShapeDtypeStruct((N, 1, B), At.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(At, Bt, Vt, St, iqh, iql, Rt, w0h, w0l)
    return jnp.transpose(out[:, 0, :], (1, 0))


# =============================================================================
# Kernel 5 (default for B % (8*128) == 0): dense-tile fused select.
# The lanes layout stores slabs as (p, p, 128) — the minor (13, 128) dims
# tile to (16, 128), wasting 3/16 of every vector register on sublane
# padding, and each matrix-row broadcast costs a sublane-broadcast op. Here
# the batch itself fills full (8, 128) vregs: slabs are (p, p, 8, 128) with
# BOTH matrix indices on untiled leading axes, so every VPU op is 100%
# dense and operand "broadcasts" along matrix axes are free register reuse.
# The kernel body is byte-for-byte the same code (`_df_select_fused_kernel`
# is rank-agnostic); only the block geometry differs, and since every df op
# is elementwise over the batch the result is bit-identical to the lanes
# kernel (with trisym=False; the trisym default changes rounding at f32-ulp
# level, see the wrapper docstring). Requires B % 1024 == 0 (a full (8, 128)
# tile per grid step); horizon.py pads any batch > 512 up to the next 1024
# multiple and routes it here — the per-element win beats the pad waste from
# there on — and sends smaller batches to kernel 4.
# =============================================================================


@full_matmul_precision
def propagator_select_dense_df_fused(
    A: jax.Array,
    Bm: jax.Array,
    vecs: jax.Array,
    scal: jax.Array,
    Qq: jax.Array,
    R_inv: jax.Array,
    Lt: jax.Array,
    *,
    jitter: float = 1e-9,
    tile: tuple = (8, 128),
    t_min: int = 1,
    trisym: bool = True,
    query_df: bool = True,
    element_df: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused-assembly df32 propagator selection, dense-tile batch layout.

    Same contract as propagator_select_lanes_df_fused (A: (B, N, n, n); Bm:
    (B, N, n, m); vecs: (B, N, 4, n); scal: (B, N, 4); Qq: (B, n, n);
    R_inv: (B, m, m); Lt: (B, n, n); returns J: (B, N) with +inf below
    t_min), but the batch is packed into full (sublane, lane) tiles —
    B % (tile[0]*tile[1]) == 0 — instead of 128-lane slabs.

    trisym (default True): compute the symmetric products (compose E/G
    congruences, query X0 congruence, element ADA/rank-1 terms) from their
    lower triangles and mirror — exactly symmetric by construction, ~20%
    fewer df terms per step, viable only in this layout (see the note in
    ops/df32.py). With trisym=False the kernel runs the identical
    per-element op sequence as the lanes kernel and its output is
    bit-identical to it (verified on hardware,
    scripts/select_dense_probe.py); with trisym=True the J curve agrees to
    df-rounding level (f32-output differences at ~1 ulp; same T* stats —
    validated e2e by the same probe)."""
    from timeopt_tpu.ops import df32 as dfm

    st, sl = tile
    tb = st * sl

    At = jnp.transpose(A, (1, 2, 3, 0))  # (N, n, n, B)
    Bt = jnp.transpose(Bm, (1, 2, 3, 0))
    Vt = jnp.transpose(vecs, (1, 2, 3, 0))  # (N, 4, n, B)
    St = jnp.transpose(scal, (1, 2, 0))  # (N, 4, B)
    Qqt = jnp.transpose(Qq, (1, 2, 0))  # (n, n, B)
    Rt = jnp.transpose(R_inv, (1, 2, 0))
    Ltt = jnp.transpose(Lt, (1, 2, 0))

    N, n, _, B = At.shape
    m = Bt.shape[2]
    p = n + 1
    assert B % tb == 0, (B, tile)
    grid = (B // tb, N)

    # k-constant df32 inverses (see the lanes wrapper) — computed in the 3D
    # lanes layout (elementwise, so bitwise independent of layout), then
    # retiled with everything else.
    eye_n = _eye_lanes(n, B, At.dtype)
    iqh, iql = dfm.df_sym_half(dfm.df_gj_inv(dfm.df_mat(Qqt), jitter, eye_n))
    Qf_df = dfm.df_matmul_tn(dfm.df_mat(Ltt), dfm.df_mat(Ltt))
    w0h, w0l = dfm.df_sym_half(dfm.df_gj_inv(Qf_df, 0.0, eye_n))

    # batch axis B -> (B // sl, sl); grid step i covers rows [i*st, (i+1)*st)
    rt = lambda x: x.reshape(x.shape[:-1] + (B // sl, sl))  # noqa: E731

    aspec = pl.BlockSpec(
        (1, n, n, st, sl), lambda i, k: (k, 0, 0, i, 0), memory_space=pltpu.VMEM
    )
    bspec = pl.BlockSpec(
        (1, n, m, st, sl), lambda i, k: (k, 0, 0, i, 0), memory_space=pltpu.VMEM
    )
    vspec = pl.BlockSpec(
        (1, 4, n, st, sl), lambda i, k: (k, 0, 0, i, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec(
        (1, 4, st, sl), lambda i, k: (k, 0, i, 0), memory_space=pltpu.VMEM
    )
    cst = pl.BlockSpec(
        (n, n, st, sl), lambda i, k: (0, 0, i, 0), memory_space=pltpu.VMEM
    )
    rspec = pl.BlockSpec(
        (m, m, st, sl), lambda i, k: (0, 0, i, 0), memory_space=pltpu.VMEM
    )
    jspec = pl.BlockSpec(
        (1, 1, st, sl), lambda i, k: (k, 0, i, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _df_select_fused_kernel, jitter=jitter, t_min=t_min, trisym=trisym,
        query_df=query_df, element_df=element_df,
    )
    scratch = [pltpu.VMEM((p, p, st, sl), At.dtype) for _ in range(6)]
    # (8, 128)-tile temporaries are 8x the lanes kernel's; the body's live set
    # (~22 slab-equivalents at 692 KB) exceeds the default 16 MB scoped-vmem
    # cap, so raise it — v5e VMEM is 128 MB and the pipeline buffers above
    # account for < 6 MB of it.
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[aspec, bspec, vspec, sspec, cst, cst, rspec, cst, cst],
        out_specs=jspec,
        out_shape=jax.ShapeDtypeStruct((N, 1, B // sl, sl), At.dtype),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(rt(At), rt(Bt), rt(Vt), rt(St), rt(iqh), rt(iql), rt(Rt), rt(w0h), rt(w0l))
    return jnp.transpose(out.reshape(N, B), (1, 0))


# Module-level jitted entries: the solver instantiates each kernel at least
# twice per trace (warm start + loop body; ilqr.py _solve_curve_methods).
# A shared jit caches the trace/lowering by avals, so the ~20k-term df
# kernel bodies are traced ONCE per shape instead of once per call site —
# a large share of the cold-compile time (scripts/compile_probe.py).
propagator_select_lanes_df_jit = jax.jit(
    propagator_select_lanes_df,
    static_argnames=("jitter", "block_b", "t_min", "interpret"),
)
propagator_select_dense_df_jit = jax.jit(
    propagator_select_dense_df,
    static_argnames=("jitter", "tile", "t_min", "trisym", "interpret"),
)
propagator_select_lanes_df_fused_jit = jax.jit(
    propagator_select_lanes_df_fused,
    static_argnames=(
        "jitter", "block_b", "t_min", "trisym", "query_df", "element_df",
        "interpret",
    ),
)
propagator_select_dense_df_fused_jit = jax.jit(
    propagator_select_dense_df_fused,
    static_argnames=(
        "jitter", "tile", "t_min", "trisym", "query_df", "element_df",
        "interpret",
    ),
)
