"""Double-single ("df32") arithmetic: each value is an unevaluated sum
hi + lo of two float32s, giving ~48 mantissa bits (eps ~ 4e-15).

Why it exists: the LFT propagator recursion chains ~160 inversions of
matrices with kappa ~ 1e4..1e5; fp32 arithmetic (eps 6e-8) corrupts the
J(T) curve by O(100) and scrambles the horizon argmin entirely, while the
*inputs* rounded to fp32 perturb J by only ~1e-4 (measured — see
solver/horizon.py notes). TPU hardware has no fp64 ALUs, so the fix is
extended-precision arithmetic built from exact fp32 ops: Knuth TwoSum and
Dekker split-based TwoProd (no FMA requirement). All functions are
elementwise over arbitrary jnp arrays, so they work identically in XLA and
inside Pallas kernels (VPU vector ops).

References: Dekker (1971), "A floating-point technique for extending the
available precision"; the df64 pattern popularized for GPUs by the QD
library — implemented from the algorithms, tuned for TPU VPU shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Dekker split constant for float32: 2^12 + 1
_SPLIT = 4097.0


def two_sum(a, b):
    """Exact addition: s + e == a + b, |e| <= ulp(s)/2 (Knuth, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Exact addition assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Exact multiplication: p + e == a*b (Dekker split, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ----- df32 values are (hi, lo) tuples ---------------------------------------


def df(x):
    """Promote an f32 array to df32."""
    return x, jnp.zeros_like(x)


def df_neg(x):
    return -x[0], -x[1]


def df_add(x, y):
    sh, se = two_sum(x[0], y[0])
    se = se + (x[1] + y[1])
    return quick_two_sum(sh, se)


def df_sub(x, y):
    return df_add(x, df_neg(y))


def df_mul(x, y):
    ph, pe = two_prod(x[0], y[0])
    pe = pe + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(ph, pe)


def df_mul_f32(x, c):
    """df * plain f32."""
    ph, pe = two_prod(x[0], c)
    pe = pe + x[1] * c
    return quick_two_sum(ph, pe)


def df_fma(acc, x, y):
    """acc + x*y in df32."""
    return df_add(acc, df_mul(x, y))


def df_recip(y):
    """1/y to df32 accuracy: f32 estimate + one df Newton step."""
    q1 = 1.0 / y[0]
    # r = 1 - q1*y (df)
    ph, pe = two_prod(q1, y[0])
    pe = pe + q1 * y[1]
    rh, re = two_sum(1.0 - ph, -pe)
    q2 = (rh + re) * q1
    return quick_two_sum(q1, q2)


def df_div(x, y):
    """x / y: f32 quotient + df residual correction."""
    q1 = x[0] / y[0]
    ph, pe = two_prod(q1, y[0])
    # r = x - q1*y
    rh, rl = df_add(x, (-ph, -(pe + q1 * y[1])))
    q2 = (rh + rl) / y[0]
    return quick_two_sum(q1, q2)


def df_to_f32(x):
    return x[0] + x[1]


# ----- small-matrix helpers in lanes layout ----------------------------------
# Matrices are (rows, cols, lanes) pairs of f32 arrays: (Ah, Al).


def df_mat(A):
    return A, jnp.zeros_like(A)


def _acc_step(acc, xk, yk):
    """One sloppy-accumulation FMA: exact TwoProd for the product hi, loose
    lo accumulation (renormalized once per output by the caller). |lo| grows
    to ~kdim ulps — harmless for kdim <= a few dozen."""
    ph, pe = two_prod(xk[0], yk[0])
    pe = pe + (xk[0] * yk[1] + xk[1] * yk[0])
    if acc is None:
        return ph, pe
    sh, se = two_sum(acc[0], ph)
    return sh, acc[1] + pe + se


def df_matmul(X, Y):
    """C[i,j,b] = sum_k X[i,k,b] Y[k,j,b] in df32; X: (a,k,b), Y: (k,c,b)."""
    Xh, Xl = X
    Yh, Yl = Y
    kdim = Xh.shape[1]
    acc = None
    for k in range(kdim):
        xk = (Xh[:, k : k + 1, :], Xl[:, k : k + 1, :])
        yk = (Yh[k : k + 1, :, :], Yl[k : k + 1, :, :])
        acc = _acc_step(acc, xk, yk)
    return quick_two_sum(*acc)


def df_matmul_nt(X, Y):
    """C = X Y^T: C[i,j,b] = sum_k X[i,k,b] Y[j,k,b]."""
    Xh, Xl = X
    Yh, Yl = Y
    kdim = Xh.shape[1]
    acc = None
    for k in range(kdim):
        xk = (Xh[:, k : k + 1, :], Xl[:, k : k + 1, :])
        yk = (
            Yh[:, k : k + 1, :].swapaxes(0, 1),
            Yl[:, k : k + 1, :].swapaxes(0, 1),
        )
        acc = _acc_step(acc, xk, yk)
    return quick_two_sum(*acc)


def df_matmul_tn(X, Y):
    """C = X^T Y: C[i,j,b] = sum_k X[k,i,b] Y[k,j,b]."""
    Xh, Xl = X
    Yh, Yl = Y
    kdim = Xh.shape[0]
    acc = None
    for k in range(kdim):
        xk = (
            Xh[k : k + 1, :, :].swapaxes(0, 1),
            Xl[k : k + 1, :, :].swapaxes(0, 1),
        )
        yk = (Yh[k : k + 1, :, :], Yl[k : k + 1, :, :])
        acc = _acc_step(acc, xk, yk)
    return quick_two_sum(*acc)


def df_gj_solve_elast(A, jitter: float, eye):
    """Solve (A + jitter I) y = e_last for the LAST unit vector in df32; GJ
    elimination on a (p, p+1, b) augmented system (≈ half the work of the
    full inverse). Returns y as a df (p, 1, b) pair."""
    Ah, Al = A
    p = Ah.shape[0]
    jh, jl = two_sum(Ah, jitter * eye)
    rhs = eye[:, p - 1 : p, :]  # (p, 1, b) = e_last
    Mh = jnp.concatenate([jh, rhs], axis=1)  # (p, p+1, b)
    Ml = jnp.concatenate([Al + jl, jnp.zeros_like(rhs)], axis=1)
    rows = [(Mh[i], Ml[i]) for i in range(p)]
    for i in range(p):
        piv = (rows[i][0][i][None, :], rows[i][1][i][None, :])
        inv_piv = df_recip(piv)
        r = df_mul(rows[i], inv_piv)
        new_rows = []
        for j in range(p):
            if j == i:
                new_rows.append(r)
            else:
                coeff = (rows[j][0][i][None, :], rows[j][1][i][None, :])
                new_rows.append(df_sub(rows[j], df_mul(coeff, r)))
        rows = new_rows
    yh = jnp.stack([rows[i][0][p:] for i in range(p)], axis=0)  # (p, 1, b)
    yl = jnp.stack([rows[i][1][p:] for i in range(p)], axis=0)
    return yh, yl


def df_sym(X):
    h, l = X
    half = 0.5
    return (
        half * (h + h.swapaxes(0, 1)) + half * (l + l.swapaxes(0, 1)),
        jnp.zeros_like(h),
    )


def df_gj_inv(A, jitter: float, eye):
    """Pivot-free Gauss-Jordan inverse of a df32 (p, p, b) matrix + jitter*I.

    `eye` is the f32 identity of matching shape. Row-list formulation; one
    df reciprocal per pivot, df FMAs for the row updates.
    """
    Ah, Al = A
    p = Ah.shape[0]
    # fold the jitter in exactly (a plain f32 add would discard a rounding
    # residual that, kappa-amplified, costs ~7 digits of the df accuracy)
    jh, jl = two_sum(Ah, jitter * eye)
    Mh = jnp.concatenate([jh, eye], axis=1)  # (p, 2p, b)
    Ml = jnp.concatenate([Al + jl, jnp.zeros_like(eye)], axis=1)
    rows = [(Mh[i], Ml[i]) for i in range(p)]  # each (2p, b)
    for i in range(p):
        piv = (rows[i][0][i][None, :], rows[i][1][i][None, :])
        inv_piv = df_recip(piv)
        r = df_mul(rows[i], inv_piv)
        new_rows = []
        for j in range(p):
            if j == i:
                new_rows.append(r)
            else:
                coeff = (rows[j][0][i][None, :], rows[j][1][i][None, :])
                new_rows.append(df_sub(rows[j], df_mul(coeff, r)))
        rows = new_rows
    Ih = jnp.stack([rows[i][0][p:] for i in range(p)], axis=0)
    Il = jnp.stack([rows[i][1][p:] for i in range(p)], axis=0)
    return Ih, Il


def df_gj_inv_pivots(A, jitter: float, eye):
    """Like df_gj_inv but also returns the stacked pivot hi-parts (p, b) —
    positive pivots certify SPD-ness (jittable Cholesky-check analogue)."""
    Ah, Al = A
    p = Ah.shape[0]
    jh, jl = two_sum(Ah, jitter * eye)
    Mh = jnp.concatenate([jh, eye], axis=1)
    Ml = jnp.concatenate([Al + jl, jnp.zeros_like(eye)], axis=1)
    rows = [(Mh[i], Ml[i]) for i in range(p)]
    pivots = []
    for i in range(p):
        piv = (rows[i][0][i][None, :], rows[i][1][i][None, :])
        pivots.append(piv[0][0])
        inv_piv = df_recip(piv)
        r = df_mul(rows[i], inv_piv)
        new_rows = []
        for j in range(p):
            if j == i:
                new_rows.append(r)
            else:
                coeff = (rows[j][0][i][None, :], rows[j][1][i][None, :])
                new_rows.append(df_sub(rows[j], df_mul(coeff, r)))
        rows = new_rows
    Ih = jnp.stack([rows[i][0][p:] for i in range(p)], axis=0)
    Il = jnp.stack([rows[i][1][p:] for i in range(p)], axis=0)
    return (Ih, Il), jnp.stack(pivots, axis=0)  # pivots: (p, b)


def df_sym_half(X):
    """0.5 (X + X^T) in df (proper df add of the transpose)."""
    h, l = X
    t = (h.swapaxes(0, 1), l.swapaxes(0, 1))
    s = df_add(X, t)
    return df_mul_f32(s, 0.5)
