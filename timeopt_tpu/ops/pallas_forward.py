"""Fused Pallas TPU kernel for the batched forward line search.

Why: the production forward pass is a `lax.scan` of N small steps over a
(5 alphas x B problems) batch — measured 7.8 ms/iteration at B=1024
(scripts/fwd_probe.py), dominated by per-scan-step dispatch and the df32
step's op count, NOT by layout padding (a lane-dense XLA variant measured
the same 8 ms). This kernel removes the per-step overhead the same way the
select/backward kernels do (ops/pallas_lft.py, ops/pallas_backward.py):

- grid = (B/bt, N) with time innermost and the batch tiled over the first
  axis in up-to-1024-lane blocks (a single whole-batch block fails Mosaic
  compilation beyond ~1024 lanes; the large tile keeps per-grid-step
  overhead low for this flops-light body) — the (hi, lo) state carry
  lives in VMEM scratch across the scan, re-initialized per batch tile,
- the system dynamics run INSIDE the kernel via the trailing-batch
  `xdot_rows` form (models/base.py) with `jax.jvp` propagating the lo half
  (same compensated df32 integration as solver/rollout_df.py),
- all 5 alpha rollouts share each step: the alpha axis rides the sublanes
  of (n, A, B) blocks,
- the truncated true cost (solver/cost.py cost_true) accumulates inline —
  masked stage costs in a df32 running sum, terminal injected per-lane at
  k+1 == T* — so only the (A, B) cost row and the trajectories leave.

Semantics: identical to forward.forward_linesearch with df_forward=True
(first-improving alpha, non-finite-anywhere rejection, nominal controls
beyond T* — /root/reference/solver.py:233-286); values differ from the
batch-leading XLA path only by float non-associativity of the rows-form
products and the df32 (vs tree-reduction f32) cost accumulation
(measured J rel diff ~1e-7 at B=1024; property-tested in
tests/test_pallas_forward.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timeopt_tpu.models.base import System
from timeopt_tpu.ops.df32 import df_add, two_prod
from timeopt_tpu.ops.wrap import angle_normalize
from timeopt_tpu.solver.rollout_df import INV_TWO_PI, TWO_PI_HI, TWO_PI_LO


def _df_wrap_rows(xh, xl, wrap_vec):
    """rollout_df._df_wrap in rows layout (subtract the nearest df32
    multiple of 2*pi from the wrapped components)."""
    k = jnp.round(xh * INV_TWO_PI) * wrap_vec
    ph, pe = two_prod(k, TWO_PI_HI)
    return df_add((xh, xl), (-ph, -(pe + k * TWO_PI_LO)))


def _quad(M, v):
    """0.5 v' M v batched over trailing axes: M (d, d, B), v (d, A, B) ->
    (A, B). Unrolled broadcasted FMAs (pure VPU work)."""
    d = v.shape[0]
    acc = None
    for i in range(d):
        mv = None
        for j in range(d):
            t = M[i, j][None, :] * v[j]
            mv = t if mv is None else mv + t
        t = v[i] * mv
        acc = t if acc is None else acc + t
    return 0.5 * acc


def _fwd_kernel(
    xk_ref, uk_ref, kk_ref, kap_ref,
    xg_ref, urf_ref, q_ref, r_ref, qf_ref, w_ref, ts_ref, wm_ref, av_ref,
    xs_ref, us_ref, j_ref,
    xh_s, xl_s, rh_s, rl_s, jt_s, fa_s, ft_s, fu_s,
    *, system: System, a_vec, N: int,
):
    k = pl.program_id(1)  # grid (batch_tile, time); time innermost
    Xk = xk_ref[0]  # (n, B)
    Uk = uk_ref[0]  # (m, B)
    Kk = kk_ref[0]  # (m, n, B)
    kapk = kap_ref[0]  # (m, B)
    xg = xg_ref[...]  # (n, B)
    urf = urf_ref[...]  # (m, B)
    Q = q_ref[...]  # (n, n, B)
    R = r_ref[...]  # (m, m, B)
    Qf = qf_ref[...]  # (n, n, B)
    w = w_ref[0]  # (B,)
    T_i = ts_ref[0].astype(jnp.int32)  # (B,) — T* exact in f32 for T <= 2^24
    wm = wm_ref[...]  # (n, B) 0/1 error-wrap mask

    n = Xk.shape[0]
    bshape = Xk.shape[1:]  # (B,) lanes layout, (st, sl) dense-tile layout
    m = Uk.shape[0]
    A = len(a_vec)
    dtype = Xk.dtype
    a_col = av_ref[...]  # (A, B) — alphas broadcast over lanes
    wm3 = wm[:, None]  # (n, 1, B)
    xg3 = xg[:, None]  # (n, 1, B)

    @pl.when(k == 0)
    def _():
        xh_s[...] = jnp.broadcast_to(Xk[:, None], (n, A) + bshape)
        xl_s[...] = jnp.zeros((n, A) + bshape, dtype)
        rh_s[...] = jnp.zeros((A,) + bshape, dtype)
        rl_s[...] = jnp.zeros((A,) + bshape, dtype)
        jt_s[...] = jnp.zeros((A,) + bshape, dtype)
        x0fin = jnp.broadcast_to(
            jnp.all(jnp.isfinite(Xk), axis=0)[None], (A,) + bshape
        ).astype(dtype)
        fa_s[...] = x0fin  # whole-trajectory finiteness (incl. X[0])
        ft_s[...] = x0fin  # finiteness over rows k <= T*
        fu_s[...] = jnp.ones((A,) + bshape, dtype)

    xh = xh_s[...]  # (n, A, B)
    xl = xl_s[...]
    active = (k < T_i)[None]  # (1, B) -> broadcasts over A

    # ---- closed-loop control: u = U_k + [k < T*](K wrap(x - x̄) + alpha kap)
    dh, dl = _df_wrap_rows(xh - Xk[:, None], xl, wm3)
    dx = dh + dl
    du = None
    for j in range(n):
        t = Kk[:, j][:, None] * dx[j][None]
        du = t if du is None else du + t
    du = du + a_col[None] * kapk[:, None]  # (m, A, B)
    u = Uk[:, None] + jnp.where(active[None], du, jnp.zeros_like(du))

    # ---- stage cost on the CURRENT state (cost_true: l_k for k < T*)
    e = xh - xg3
    e = jnp.where(wm3 > 0.5, angle_normalize(e), e)
    du_r = u - urf[:, None]
    l = _quad(Q, e) + _quad(R, du_r) + w[None]
    l = jnp.where(active, l, jnp.zeros_like(l))
    rh, rl = df_add((rh_s[...], rl_s[...]), (l, jnp.zeros_like(l)))
    rh_s[...] = rh
    rl_s[...] = rl

    # ---- compensated df32 Euler step (rollout_df.df_step, norm_guard=False)
    dt64 = float(system.dt)
    dt_hi = jnp.asarray(np.float32(dt64), dtype)
    dt_lo = jnp.asarray(np.float32(dt64 - float(np.float32(dt64))), dtype)
    d, dj = jax.jvp(lambda x: system.xdot_rows(x, u), (xh,), (xl,))
    ph, pe = two_prod(dt_hi, d)
    nh, nl = df_add((xh, xl), (ph, pe + (dt_hi * dj + dt_lo * d)))
    if system.wrap_idx:
        # static in-state wrap set, built from an in-kernel iota (Pallas
        # rejects captured constant arrays)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * (len(bshape) + 1), 0)
        swm = None
        for i in system.wrap_idx:
            t = rows == int(i)
            swm = t if swm is None else (swm | t)
        nh, nl = _df_wrap_rows(nh, nl, swm.astype(dtype))
    if system.guard_rows is not None:
        bad = system.guard_rows(xh, u)  # (A, B)
        poison = jnp.where(
            bad, jnp.asarray(jnp.nan, dtype), jnp.asarray(0.0, dtype)
        )
        nh = nh + poison
        nl = nl + poison

    # ---- terminal injection where k+1 == T* (each lane exactly once)
    is_term = ((k + 1) == T_i)[None]  # (1, B)

    @pl.when(jnp.any(is_term))
    def _():
        eT = nh - xg3
        eT = jnp.where(wm3 > 0.5, angle_normalize(eT), eT)
        th_, tl_ = df_add((rh, rl), (_quad(Qf, eT), jnp.zeros((A,) + bshape, dtype)))
        jt_s[...] = jnp.where(is_term, th_ + tl_, jt_s[...])

    # ---- finiteness flags (cost_true x_ok/u_ok + the reference's
    # non-finite-anywhere alpha rejection)
    nfin = jnp.all(jnp.isfinite(nh), axis=0).astype(dtype)  # (A, B)
    one = jnp.ones_like(nfin)
    fa_s[...] = fa_s[...] * nfin
    ft_s[...] = ft_s[...] * jnp.where((k + 1 <= T_i)[None], nfin, one)
    ufin = jnp.all(jnp.isfinite(u), axis=0).astype(dtype)
    fu_s[...] = fu_s[...] * jnp.where(active, ufin, one)

    xh_s[...] = nh
    xl_s[...] = nl
    xs_ref[0] = nh
    us_ref[0] = u

    @pl.when(k == N - 1)
    def _():
        tot = jt_s[...]
        ok = (
            (ft_s[...] > 0.5)
            & (fu_s[...] > 0.5)
            & (T_i > 0)[None]
            & jnp.isfinite(tot)
            & (fa_s[...] > 0.5)
        )
        j_ref[...] = jnp.where(ok, tot, jnp.asarray(jnp.inf, dtype))


def _prep_trailing(a_vec, X, U, K, kappa, T_star, xg, u_ref, Qm, Rm, Qf, w, wrap_mask):
    """Batch-leading -> batch-trailing inputs shared by both kernel layouts."""
    A = len(a_vec)
    B = X.shape[0]
    dtype = X.dtype
    Xt = jnp.transpose(X[:, :-1], (1, 2, 0))  # (N, n, B)
    Ut = jnp.transpose(U, (1, 2, 0))  # (N, m, B)
    Kt = jnp.transpose(K, (1, 2, 3, 0))  # (N, m, n, B)
    kapt = jnp.transpose(kappa, (1, 2, 0))  # (N, m, B)
    xgt = jnp.transpose(xg, (1, 0))
    urt = jnp.transpose(u_ref, (1, 0))
    Qt = jnp.transpose(Qm, (1, 2, 0))
    Rt = jnp.transpose(Rm, (1, 2, 0))
    Qft = jnp.transpose(Qf, (1, 2, 0))
    wt = w[None, :]
    Tt = T_star.astype(dtype)[None, :]
    wmt = jnp.transpose(wrap_mask, (1, 0)).astype(dtype)
    avt = jnp.broadcast_to(
        jnp.asarray(np.asarray(a_vec, np.float32), dtype)[:, None], (A, B)
    )
    return (Xt, Ut, Kt, kapt, xgt, urt, Qt, Rt, Qft, wt, Tt, wmt, avt)


def _select_first_improving(X, Xt, Ut, xs, us, Js, J_old):
    """First-improving-alpha selection (forward.forward_linesearch
    semantics), shared by both kernel layouts. Batch-trailing in/out of
    the alpha pick; returns batch-leading (Xn, Un, Jn, accepted)."""
    improved = Js < J_old[None, :]
    accepted = jnp.any(improved, axis=0)  # (B,)
    idx = jnp.argmax(improved, axis=0)  # (B,)

    def sel(S):
        # per-lane alpha pick as A-1 unrolled `where`s: a take_along_axis
        # gather here measured ~20 ms at B=1024 (TPU gathers are slow);
        # `where` keeps it lane-dense and NaN-safe (rejected alphas may
        # carry poisoned trajectories — a one-hot multiply would leak NaN)
        acc = S[:, :, 0, :]
        for a in range(1, S.shape[2]):
            acc = jnp.where(idx[None, None, :] == a, S[:, :, a, :], acc)
        return acc

    Xsel = jnp.concatenate([Xt[:1], sel(xs)], axis=0)  # (N+1, n, B)
    Usel = sel(us)  # (N, m, B)

    acc3 = accepted[None, None, :]
    Xfull = jnp.transpose(X, (1, 2, 0))  # (N+1, n, B)
    Xn = jnp.transpose(jnp.where(acc3, Xsel, Xfull), (2, 0, 1))
    Un = jnp.transpose(jnp.where(acc3, Usel, Ut), (2, 0, 1))
    Jn = jnp.where(accepted, jnp.take_along_axis(Js, idx[None, :], axis=0)[0], J_old)
    return Xn, Un, Jn, accepted


def linesearch_lanes_df(
    system: System,
    a_vec,
    X, U, K, kappa, T_star, J_old,
    xg, u_ref, Qm, Rm, Qf, w, wrap_mask,
    *,
    block_b: int = 1024,
    interpret: bool = False,
):
    """Batched all-alphas line search through the fused rollout kernel.

    Batch-leading inputs (B padded to a lane multiple by the caller):
    X (B, N+1, n), U (B, N, m), K (B, N, m, n), kappa (B, N, m),
    T_star (B,), J_old (B,); problem data xg (B, n), u_ref (B, m),
    Qm/Rm/Qf (B, d, d), w (B,), wrap_mask (B, n).
    Returns (Xn, Un, Jn, accepted) batch-leading with the selection
    semantics of forward.forward_linesearch.

    The batch tiles over the first grid axis in blocks of up to `block_b`
    lanes (grid (B/bt, N), time innermost, carry persisting per tile — the
    same pattern as the select/backward kernels). A single whole-batch
    block fails to compile beyond ~1024 lanes, and the larger tile size
    (vs their 128) keeps the per-grid-step overhead share low for this
    flops-light kernel. The tile size is gcd(B, block_b), which divides B
    exactly — the production caller pads B to a 128-lane multiple, so the
    tile stays >= 128 and no additional padding (wasted rollouts) is ever
    needed here.
    """
    B, Np1, n = X.shape
    N = Np1 - 1
    m = U.shape[-1]
    A = len(a_vec)
    dtype = X.dtype
    bt = math.gcd(B, block_b)

    (Xt, Ut, Kt, kapt, xgt, urt, Qt, Rt, Qft, wt, Tt, wmt, avt) = _prep_trailing(
        a_vec, X, U, K, kappa, T_star, xg, u_ref, Qm, Rm, Qf, w, wrap_mask
    )

    grid = (B // bt, N)
    step4 = lambda d1, d2: pl.BlockSpec(  # noqa: E731
        (1, d1, d2, bt), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM
    )
    step3 = lambda d1: pl.BlockSpec(  # noqa: E731
        (1, d1, bt), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM
    )
    cst2 = lambda d1: pl.BlockSpec(  # noqa: E731
        (d1, bt), lambda i, k: (0, i), memory_space=pltpu.VMEM
    )
    cst3 = lambda d1, d2: pl.BlockSpec(  # noqa: E731
        (d1, d2, bt), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_fwd_kernel, system=system, a_vec=tuple(a_vec), N=N)
    xs, us, Js = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            step3(n), step3(m), step4(m, n), step3(m),
            cst2(n), cst2(m), cst3(n, n), cst3(m, m), cst3(n, n),
            cst2(1), cst2(1), cst2(n), cst2(A),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, n, A, bt), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, m, A, bt), lambda i, k: (k, 0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((A, bt), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, n, A, B), dtype),
            jax.ShapeDtypeStruct((N, m, A, B), dtype),
            jax.ShapeDtypeStruct((A, B), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, A, bt), dtype),
            pltpu.VMEM((n, A, bt), dtype),
        ] + [pltpu.VMEM((A, bt), dtype) for _ in range(6)],
        interpret=interpret,
    )(Xt, Ut, Kt, kapt, xgt, urt, Qt, Rt, Qft, wt, Tt, wmt, avt)

    return _select_first_improving(X, Xt, Ut, xs, us, Js, J_old)


def linesearch_dense_df(
    system: System,
    a_vec,
    X, U, K, kappa, T_star, J_old,
    xg, u_ref, Qm, Rm, Qf, w, wrap_mask,
    *,
    tile: tuple = (8, 128),
    interpret: bool = False,
):
    """Dense-tile variant of linesearch_lanes_df: the batch fills full
    (sublane, lane) tiles — B % (tile[0]*tile[1]) == 0 — with the state
    row and alpha axes on untiled leading dims (see ops/pallas_lft.py
    kernel 5). The lanes layout puts the A=5 alpha axis on sublanes,
    padding 5 -> 8 (+60% on every (·, A, B) op); here every vreg is
    dense. Shared rank-agnostic kernel body -> bit-identical outputs
    (hardware check in scripts/fwd_dense_probe.py)."""
    st, sl = tile
    tb = st * sl
    B, Np1, n = X.shape
    N = Np1 - 1
    m = U.shape[-1]
    A = len(a_vec)
    dtype = X.dtype
    assert B % tb == 0, (B, tile)

    rt = lambda x: x.reshape(x.shape[:-1] + (B // sl, sl))  # noqa: E731
    (Xt, Ut, Kt, kapt, xgt, urt, Qt, Rt, Qft, wt, Tt, wmt, avt) = _prep_trailing(
        a_vec, X, U, K, kappa, T_star, xg, u_ref, Qm, Rm, Qf, w, wrap_mask
    )

    grid = (B // tb, N)
    step5 = lambda d1, d2: pl.BlockSpec(  # noqa: E731
        (1, d1, d2, st, sl), lambda i, k: (k, 0, 0, i, 0), memory_space=pltpu.VMEM
    )
    step4 = lambda d1: pl.BlockSpec(  # noqa: E731
        (1, d1, st, sl), lambda i, k: (k, 0, i, 0), memory_space=pltpu.VMEM
    )
    cst3 = lambda d1: pl.BlockSpec(  # noqa: E731
        (d1, st, sl), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM
    )
    cst4 = lambda d1, d2: pl.BlockSpec(  # noqa: E731
        (d1, d2, st, sl), lambda i, k: (0, 0, i, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_fwd_kernel, system=system, a_vec=tuple(a_vec), N=N)
    xs, us, Js = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            step4(n), step4(m), step5(m, n), step4(m),
            cst3(n), cst3(m), cst4(n, n), cst4(m, m), cst4(n, n),
            cst3(1), cst3(1), cst3(n), cst3(A),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, n, A, st, sl), lambda i, k: (k, 0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m, A, st, sl), lambda i, k: (k, 0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (A, st, sl), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, n, A, B // sl, sl), dtype),
            jax.ShapeDtypeStruct((N, m, A, B // sl, sl), dtype),
            jax.ShapeDtypeStruct((A, B // sl, sl), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, A, st, sl), dtype),
            pltpu.VMEM((n, A, st, sl), dtype),
        ] + [pltpu.VMEM((A, st, sl), dtype) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        rt(Xt), rt(Ut), rt(Kt), rt(kapt), rt(xgt), rt(urt), rt(Qt), rt(Rt),
        rt(Qft), rt(wt), rt(Tt), rt(wmt), rt(avt),
    )
    xs = xs.reshape(N, n, A, B)
    us = us.reshape(N, m, A, B)
    Js = Js.reshape(A, B)

    return _select_first_improving(X, Xt, Ut, xs, us, Js, J_old)


# Shared jit (see ops/pallas_lft.py note): system and a_vec are static.
linesearch_lanes_df_jit = jax.jit(
    linesearch_lanes_df, static_argnums=(0, 1),
    static_argnames=("block_b", "interpret"),
)
linesearch_dense_df_jit = jax.jit(
    linesearch_dense_df, static_argnums=(0, 1),
    static_argnames=("tile", "interpret"),
)
