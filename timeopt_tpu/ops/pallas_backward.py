"""Fused double-single Pallas kernel for the truncated iLQR backward pass.

Same design as the propagator select kernel (timeopt_tpu/ops/pallas_lft.py):
batch on the lane axis, value-function carry (Vx, Vxx) resident in VMEM
scratch across the whole reverse sweep, per-step algebra as unrolled
broadcasted VPU FMAs in df32 (fp32 Riccati noise measurably flips line-search
accept decisions and final horizons; see ops/df32.py). The reverse time
order is realized by the grid index map (grid step k processes t = N-1-k).

Per-lane (per-problem) truncation: the terminal injection mask (t+1 == T*)
and the active mask (t < T*) compare against a *per-lane* T* vector — free
in lanes layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timeopt_tpu.ops import df32 as dfm
from timeopt_tpu.ops.pallas_lft import _eye_lanes


def _wsel(mask, a, b):
    """Per-lane select on df pairs; mask broadcasts over leading axes."""
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def _t(X):
    return (X[0].swapaxes(0, 1), X[1].swapaxes(0, 1))


def _backward_kernel(
    a_ref, b_ref, lx_ref, lu_ref, qs_ref, qfet_ref, etok_ref, sok_ref,
    qf_ref, r_ref, ts_ref, lm_ref,
    kap_ref, kk_ref, ok_ref,
    vxh, vxl, vxxh, vxxl, okc,
    *, N, trisym=False,
):
    k = pl.program_id(1)
    t = (N - 1) - k

    A = a_ref[0]  # (n, n, bt)
    Bm = b_ref[0]  # (n, m, bt)
    lx = lx_ref[0][:, None, :]  # (n, 1, bt)
    lu = lu_ref[0][:, None, :]  # (m, 1, bt)
    Qs = qs_ref[0]
    QfeT = qfet_ref[0][:, None, :]  # (n, 1, bt)
    eT_ok = etok_ref[0][0]  # (bt,)
    s_ok = sok_ref[0][0]  # (bt,)
    Qf = qf_ref[:]  # (n, n, bt)
    R = r_ref[:]  # (m, m, bt)
    T_star = ts_ref[0][0]  # (bt,)
    lm = lm_ref[0][0]  # (bt,)

    n = A.shape[0]
    m = Bm.shape[1]
    bshape = A.shape[2:]  # (bt,) lanes layout, (st, sl) dense-tile layout
    eye_m = _eye_lanes(m, bshape, A.dtype)

    ok_prev = jnp.where(k == 0, (T_star > 0).astype(A.dtype), okc[0])

    # Tile-level truncation: the reverse sweep starts at t = N-1, but every
    # step with t >= max(T*) over the tile's lanes is a pure pass-through
    # (no lane is active and no lane's terminal injection fires, since
    # t+1 == T* implies t < max(T*)). Skip the whole df32 step body there
    # and emit the trivial outputs — for T* << N (e.g. quadrotor T*~51 of
    # N=160) this removes most of the (N - T*) dead grid steps
    # (VERDICT round 1, next-round item 1).
    maxT = jnp.max(T_star)  # scalar, in A.dtype (T* streamed as f32)

    @pl.when(t >= maxT)
    def _():
        kap_ref[0] = jnp.zeros((m,) + bshape, A.dtype)
        kk_ref[0] = jnp.zeros((m, n) + bshape, A.dtype)
        ok_ref[0, 0] = ok_prev
        okc[0] = ok_prev

    @pl.when(t < maxT)
    def _():
        _backward_step_body(
            t, A, Bm, lx, lu, Qs, QfeT, eT_ok, s_ok, Qf, R, T_star, lm,
            ok_prev, eye_m, kap_ref, kk_ref, ok_ref, vxh, vxl, vxxh, vxxl, okc,
            trisym=trisym,
        )


def _backward_step_body(
    t, A, Bm, lx, lu, Qs, QfeT, eT_ok, s_ok, Qf, R, T_star, lm,
    ok_prev, eye_m, kap_ref, kk_ref, ok_ref, vxh, vxl, vxxh, vxxl, okc,
    trisym=False,
):
    is_term = ((t + 1) == T_star)[None, None, :]  # (1,1,bt)
    Vx = _wsel(is_term, dfm.df_mat(QfeT), (vxh[:][:, None, :], vxl[:][:, None, :]))
    Vxx = _wsel(is_term, dfm.df_mat(Qf), (vxxh[:], vxxl[:]))
    ok_prev = ok_prev * jnp.where(is_term[0, 0], eT_ok, 1.0)

    # trisym (dense-tile layout only, see ops/df32.py): the symmetric
    # congruences A'(Vxx A), B'(Vxx B), K'(Quu K) compute lower triangles
    # and mirror — valid because the Vxx carry is exactly symmetric by
    # induction (backward_truncated symmetrizes Qstage/R/Qf before
    # streaming them; trisym/sym_half outputs are exactly symmetric; df
    # adds of symmetric operands stay symmetric).
    Adf = dfm.df_mat(A)
    Bdf = dfm.df_mat(Bm)
    Qx = dfm.df_add(dfm.df_mat(lx), dfm.df_matmul_tn(Adf, Vx))
    Qu = dfm.df_add(dfm.df_mat(lu), dfm.df_matmul_tn(Bdf, Vx))
    VA = dfm.df_matmul(Vxx, Adf)
    VB = dfm.df_matmul(Vxx, Bdf)
    if trisym:
        Qxx = dfm.df_add(dfm.df_mat(Qs), dfm.df_matmul_tn_trisym(Adf, VA))
        Quu = dfm.df_add(dfm.df_mat(R), dfm.df_matmul_tn_trisym(Bdf, VB))
    else:
        Qxx = dfm.df_add(dfm.df_mat(Qs), dfm.df_matmul_tn(Adf, VA))
        Quu = dfm.df_add(dfm.df_mat(R), dfm.df_matmul_tn(Bdf, VB))
    Qux = dfm.df_matmul_tn(Bdf, VA)  # (m, n)

    if trisym:
        # Quu is exactly symmetric already — no sym_half pass needed
        Quu_reg = dfm.df_add(Quu, dfm.df_mat(lm[None, None, :] * eye_m))
    else:
        Quu_reg = dfm.df_add(dfm.df_sym_half(Quu), dfm.df_mat(lm[None, None, :] * eye_m))
    iQ, piv = dfm.df_gj_inv_pivots(Quu_reg, 0.0, eye_m)
    pd = jnp.all((piv > 0) & jnp.isfinite(piv), axis=0)  # (bt,)

    kap = dfm.df_neg(dfm.df_matmul(iQ, Qu))  # (m, 1)
    K = dfm.df_neg(dfm.df_matmul(iQ, Qux))  # (m, n)

    KtQu = dfm.df_matmul_tn(K, Qu)  # (n, 1)
    Quxt_kap = dfm.df_matmul_tn(Qux, kap)  # (n, 1)
    Quu_kap = dfm.df_matmul(Quu, kap)
    KtQuuk = dfm.df_matmul_tn(K, Quu_kap)
    Vx_new = dfm.df_add(dfm.df_add(Qx, KtQu), dfm.df_add(Quxt_kap, KtQuuk))

    KtQux = dfm.df_matmul_tn(K, Qux)  # (n, n)
    if trisym:
        KtQuuK = dfm.df_matmul_tn_trisym(K, dfm.df_matmul(Quu, K))
        # Qxx, KtQuuK exactly symmetric; KtQux + KtQux' exactly symmetric
        # (df_add is bitwise-commutative) — and summing THAT pair first
        # keeps every addend of the outer adds entrywise-symmetric, so
        # Vxx_new is exactly symmetric with no sym_half pass
        M = dfm.df_add(KtQux, _t(KtQux))
        Vxx_new = dfm.df_add(dfm.df_add(Qxx, M), KtQuuK)
    else:
        KtQuuK = dfm.df_matmul_tn(K, dfm.df_matmul(Quu, K))
        Vxx_new = dfm.df_sym_half(
            dfm.df_add(dfm.df_add(Qxx, KtQux), dfm.df_add(_t(KtQux), KtQuuK))
        )

    active = (t < T_star)[None, None, :]  # (1,1,bt)
    fin = (
        jnp.all(jnp.isfinite(Vx_new[0]), axis=(0, 1))
        & jnp.all(jnp.isfinite(Vxx_new[0]), axis=(0, 1))
    )
    step_ok = (pd & (s_ok > 0.5) & fin).astype(A.dtype)
    ok_new = ok_prev * jnp.where(active[0, 0], step_ok, 1.0)
    okc[0] = ok_new

    Vx_out = _wsel(active, Vx_new, Vx)
    Vxx_out = _wsel(active, Vxx_new, Vxx)
    vxh[:], vxl[:] = Vx_out[0][:, 0, :], Vx_out[1][:, 0, :]
    vxxh[:], vxxl[:] = Vxx_out

    zero = jnp.asarray(0.0, A.dtype)
    kap_f32 = kap[0] + kap[1]  # (m, 1, bt)
    K_f32 = K[0] + K[1]  # (m, n, bt)
    kap_ref[0] = jnp.where(active[0], kap_f32[:, 0], zero)
    kk_ref[0] = jnp.where(active, K_f32, zero)
    ok_ref[0, 0] = ok_new


def backward_lanes_df(
    A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm,
    *,
    block_b: int = 128,
    trisym: bool = False,
    interpret: bool = False,
):
    """Batched truncated backward pass (df32 lanes kernel).

    trisym=False (the default) is the frozen bitwise-stable contract path
    (CLAUDE.md invariant 5); trisym=True runs the triangle-symmetric body
    in the lanes layout — ragged rows re-pad on the sublane axis there
    (ops/df32.py layout note), measured a throughput dead end in round 3,
    exposed as a knob for the round-5 batch-of-1 latency probing
    (scripts/latency_probe.py).

    Batch-leading inputs: A (B,N,n,n), B (B,N,n,m), lx (B,N,n), lu (B,N,m),
    Qstage (B,N,n,n), QfeT (B,N,n), eT_ok/step_ok (B,N), Qf (B,n,n),
    R (B,m,m), T_star (B,), lm (B,). Returns kappa (B,N,m), K (B,N,m,n),
    ok (B,) bool.
    """
    Bb, N, n, _ = A.shape
    m = B.shape[-1]
    assert Bb % block_b == 0, (Bb, block_b)

    to_lanes4 = lambda x: jnp.transpose(x, (1, 2, 3, 0))
    to_lanes3 = lambda x: jnp.transpose(x, (1, 2, 0))
    At = to_lanes4(A)
    Bt_ = to_lanes4(B)
    lxt = to_lanes3(lx)
    lut = to_lanes3(lu)
    Qst = to_lanes4(Qstage)
    QfeTt = to_lanes3(QfeT)
    etokt = jnp.transpose(eT_ok, (1, 0))[:, None, :]  # (N, 1, B)
    sokt = jnp.transpose(step_ok, (1, 0))[:, None, :]
    Qft = jnp.transpose(Qf, (1, 2, 0))  # (n, n, B)
    Rt = jnp.transpose(R, (1, 2, 0))
    tst = T_star.astype(At.dtype)[None, None, :]  # (1, 1, B)
    lmt = lm[None, None, :]

    grid = (Bb // block_b, N)
    rev = lambda i, k: (N - 1 - k, 0, 0, i)
    rev3 = lambda i, k: (N - 1 - k, 0, i)
    const3 = lambda i, k: (0, 0, i)

    spec_nn = pl.BlockSpec((1, n, n, block_b), rev, memory_space=pltpu.VMEM)
    spec_nm = pl.BlockSpec((1, n, m, block_b), rev, memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((1, n, block_b), rev3, memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, m, block_b), rev3, memory_space=pltpu.VMEM)
    spec_f = pl.BlockSpec((1, 1, block_b), rev3, memory_space=pltpu.VMEM)
    spec_qf = pl.BlockSpec((n, n, block_b), const3, memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((m, m, block_b), const3, memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, 1, block_b), const3, memory_space=pltpu.VMEM)

    out_kap = pl.BlockSpec((1, m, block_b), rev3, memory_space=pltpu.VMEM)
    out_K = pl.BlockSpec((1, m, n, block_b), rev, memory_space=pltpu.VMEM)
    out_ok = pl.BlockSpec((1, 1, block_b), rev3, memory_space=pltpu.VMEM)

    kernel = functools.partial(_backward_kernel, N=N, trisym=trisym)
    kappa, K, ok = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec_nn, spec_nm, spec_n, spec_m, spec_nn, spec_n, spec_f, spec_f,
            spec_qf, spec_r, spec_c, spec_c,
        ],
        out_specs=(out_kap, out_K, out_ok),
        out_shape=(
            jax.ShapeDtypeStruct((N, m, Bb), At.dtype),
            jax.ShapeDtypeStruct((N, m, n, Bb), At.dtype),
            jax.ShapeDtypeStruct((N, 1, Bb), At.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, block_b), At.dtype),
            pltpu.VMEM((n, block_b), At.dtype),
            pltpu.VMEM((n, n, block_b), At.dtype),
            pltpu.VMEM((n, n, block_b), At.dtype),
            pltpu.VMEM((1, block_b), At.dtype),
        ],
        interpret=interpret,
    )(At, Bt_, lxt, lut, Qst, QfeTt, etokt, sokt, Qft, Rt, tst, lmt)

    kappa_b = jnp.transpose(kappa, (2, 0, 1))  # (B, N, m)
    K_b = jnp.transpose(K, (3, 0, 1, 2))  # (B, N, m, n)
    ok_b = ok[0, 0, :] > 0.5  # row t=0, written by the last grid step
    return kappa_b, K_b, ok_b


def backward_dense_df(
    A, B, lx, lu, Qstage, QfeT, eT_ok, step_ok, Qf, R, T_star, lm,
    *,
    tile: tuple = (8, 128),
    trisym: bool = False,
    interpret: bool = False,
):
    """Batched truncated backward pass, dense-tile batch layout.

    Same contract as backward_lanes_df, but the batch fills full
    (sublane, lane) tiles — B % (tile[0]*tile[1]) == 0 — with matrix
    indices on untiled leading axes (see ops/pallas_lft.py kernel 5: zero
    sublane padding, broadcast-free matrix-axis reuse, bit-identical
    output). The kernel body is the shared rank-agnostic _backward_kernel.

    Measured (B=1024 quadrotor, scripts/bw_dense_probe.py): with
    trisym=False the relayout alone is bit-identical but SLOWER than the
    lanes kernel (5.4-5.6 vs 5.1-5.4 ms — the step is latency-bound in
    its m-dim factorization chains, so vector density alone buys
    nothing); with trisym=True (triangle-only A'VA / B'VB / K'QuuK,
    dropped sym_half passes) it wins at 4.76 ms with outputs bitwise
    equal to the plain dense run (df-lo differences stay below f32 output
    resolution). Production routes B > 512 here with trisym=True
    (solver/backward.py).
    """
    st, sl = tile
    tb = st * sl
    Bb, N, n, _ = A.shape
    m = B.shape[-1]
    assert Bb % tb == 0, (Bb, tile)

    to_lanes4 = lambda x: jnp.transpose(x, (1, 2, 3, 0))
    to_lanes3 = lambda x: jnp.transpose(x, (1, 2, 0))
    rt = lambda x: x.reshape(x.shape[:-1] + (Bb // sl, sl))
    At = rt(to_lanes4(A))
    Bt_ = rt(to_lanes4(B))
    lxt = rt(to_lanes3(lx))
    lut = rt(to_lanes3(lu))
    Qst = rt(to_lanes4(Qstage))
    QfeTt = rt(to_lanes3(QfeT))
    etokt = rt(jnp.transpose(eT_ok, (1, 0))[:, None, :])  # (N, 1, Bb//sl, sl)
    sokt = rt(jnp.transpose(step_ok, (1, 0))[:, None, :])
    Qft = rt(jnp.transpose(Qf, (1, 2, 0)))  # (n, n, Bb//sl, sl)
    Rt = rt(jnp.transpose(R, (1, 2, 0)))
    tst = rt(T_star.astype(At.dtype)[None, None, :])  # (1, 1, Bb//sl, sl)
    lmt = rt(lm[None, None, :])

    grid = (Bb // tb, N)
    rev5 = lambda i, k: (N - 1 - k, 0, 0, i, 0)
    rev4 = lambda i, k: (N - 1 - k, 0, i, 0)
    const4 = lambda i, k: (0, 0, i, 0)

    spec_nn = pl.BlockSpec((1, n, n, st, sl), rev5, memory_space=pltpu.VMEM)
    spec_nm = pl.BlockSpec((1, n, m, st, sl), rev5, memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((1, n, st, sl), rev4, memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, m, st, sl), rev4, memory_space=pltpu.VMEM)
    spec_f = pl.BlockSpec((1, 1, st, sl), rev4, memory_space=pltpu.VMEM)
    spec_qf = pl.BlockSpec((n, n, st, sl), const4, memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((m, m, st, sl), const4, memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, 1, st, sl), const4, memory_space=pltpu.VMEM)

    out_kap = pl.BlockSpec((1, m, st, sl), rev4, memory_space=pltpu.VMEM)
    out_K = pl.BlockSpec((1, m, n, st, sl), rev5, memory_space=pltpu.VMEM)
    out_ok = pl.BlockSpec((1, 1, st, sl), rev4, memory_space=pltpu.VMEM)

    kernel = functools.partial(_backward_kernel, N=N, trisym=trisym)
    kappa, K, ok = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec_nn, spec_nm, spec_n, spec_m, spec_nn, spec_n, spec_f, spec_f,
            spec_qf, spec_r, spec_c, spec_c,
        ],
        out_specs=(out_kap, out_K, out_ok),
        out_shape=(
            jax.ShapeDtypeStruct((N, m, Bb // sl, sl), At.dtype),
            jax.ShapeDtypeStruct((N, m, n, Bb // sl, sl), At.dtype),
            jax.ShapeDtypeStruct((N, 1, Bb // sl, sl), At.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, st, sl), At.dtype),
            pltpu.VMEM((n, st, sl), At.dtype),
            pltpu.VMEM((n, n, st, sl), At.dtype),
            pltpu.VMEM((n, n, st, sl), At.dtype),
            pltpu.VMEM((1, st, sl), At.dtype),
        ],
        # (8,128)-tile temporaries are 8x the lanes kernel's; headroom over
        # the 16 MB default scoped-vmem cap (see ops/pallas_lft.py kernel 5)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(At, Bt_, lxt, lut, Qst, QfeTt, etokt, sokt, Qft, Rt, tst, lmt)

    kappa_b = jnp.transpose(kappa.reshape(N, m, Bb), (2, 0, 1))  # (B, N, m)
    K_b = jnp.transpose(K.reshape(N, m, n, Bb), (3, 0, 1, 2))  # (B, N, m, n)
    ok_b = ok.reshape(N, Bb)[0] > 0.5  # row t=0, written by the last grid step
    return kappa_b, K_b, ok_b


# Shared jit: the solver instantiates the backward kernel twice per trace
# (warm start + loop body); caching the trace by avals halves its share of
# the cold compile (see ops/pallas_lft.py note).
backward_lanes_df_jit = jax.jit(
    backward_lanes_df, static_argnames=("block_b", "trisym", "interpret")
)
backward_dense_df_jit = jax.jit(
    backward_dense_df, static_argnames=("tile", "trisym", "interpret")
)
