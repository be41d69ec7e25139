"""Layout experiment: LFT prefix scan with batch-leading (vmap) vs
batch-trailing (lanes) layouts on TPU. Decides the custom_vmap redesign."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

P = 13  # n+1 for the quadrotor
N = 160
B = 1024


def sym_L(A):  # (..., p, p)
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def gj_inv_lead(A):  # (B, p, p)
    n = A.shape[-1]
    M = jnp.concatenate([A, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)], -1)
    for i in range(n):
        piv = M[..., i, i]
        row = M[..., i, :] / piv[..., None]
        col = M[..., :, i]
        M = M - col[..., :, None] * row[..., None, :]
        M = M.at[..., i, :].set(row)
    return M[..., :, n:]


def compose_lead(c1, c2):
    E1, F1, G1 = c1
    E2, F2, G2 = c2
    W = gj_inv_lead(E2 + G1)
    F1W = F1 @ W
    return (
        sym_L(E1 - F1W @ jnp.swapaxes(F1, -1, -2)),
        F1W @ F2,
        sym_L(G2 - jnp.swapaxes(F2, -1, -2) @ W @ F2),
    )


def scan_lead(E, F, G):  # (N, B, p, p) each
    def f(c, e):
        o = compose_lead(c, e)
        return o, o

    first = (E[0], F[0], G[0])
    _, out = lax.scan(f, first, (E[1:], F[1:], G[1:]))
    return out


# ---- trailing-batch (lanes) versions: arrays (p, p, B)

def symT(A):
    return 0.5 * (A + jnp.swapaxes(A, 0, 1))


def matmulT(A, Bm):  # (p,p,B) x (p,p,B)
    return jnp.einsum("ikb,kjb->ijb", A, Bm)


def gj_inv_T(A):  # (p, p, B)
    n = A.shape[0]
    I = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype)[..., None], A.shape)
    M = jnp.concatenate([A, I], axis=1)  # (p, 2p, B)
    for i in range(n):
        piv = M[i, i, :]
        row = M[i, :, :] / piv[None, :]
        col = M[:, i, :]
        M = M - col[:, None, :] * row[None, :, :]
        M = M.at[i, :, :].set(row)
    return M[:, n:, :]


def compose_T(c1, c2):
    E1, F1, G1 = c1
    E2, F2, G2 = c2
    W = gj_inv_T(E2 + G1)
    F1W = matmulT(F1, W)
    F1t = jnp.swapaxes(F1, 0, 1)
    F2t = jnp.swapaxes(F2, 0, 1)
    return (
        symT(E1 - matmulT(F1W, F1t)),
        matmulT(F1W, F2),
        symT(G2 - matmulT(F2t, matmulT(W, F2))),
    )


def scan_T(E, F, G):  # (N, p, p, B)
    def f(c, e):
        o = compose_T(c, e)
        return o, o

    first = (E[0], F[0], G[0])
    _, out = lax.scan(f, first, (E[1:], F[1:], G[1:]))
    return out


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    H = rng.standard_normal((N, B, P, P)).astype(np.float32) * 0.1
    E = jnp.asarray(H @ np.swapaxes(H, -1, -2) + np.eye(P, dtype=np.float32))
    F = jnp.asarray(rng.standard_normal((N, B, P, P)).astype(np.float32) * 0.1)
    G = jnp.asarray(
        0.5 * (H @ np.swapaxes(H, -1, -2)) + 0.1 * np.eye(P, dtype=np.float32)
    )

    o1 = bench("lead (N,B,p,p)", scan_lead, E, F, G)

    Et = jnp.transpose(E, (0, 2, 3, 1))
    Ft = jnp.transpose(F, (0, 2, 3, 1))
    Gt = jnp.transpose(G, (0, 2, 3, 1))
    o2 = bench("lanes (N,p,p,B)", scan_T, Et, Ft, Gt)

    d = np.abs(np.asarray(o1[0]) - np.transpose(np.asarray(o2[0]), (0, 3, 1, 2))).max()
    print("max diff:", d)

    # with transposes included (the integration cost)
    def scan_T_with_transpose(E, F, G):
        Et = jnp.transpose(E, (0, 2, 3, 1))
        Ft = jnp.transpose(F, (0, 2, 3, 1))
        Gt = jnp.transpose(G, (0, 2, 3, 1))
        o = scan_T(Et, Ft, Gt)
        return tuple(jnp.transpose(x, (0, 3, 1, 2)) for x in o)

    bench("lanes + transposes", scan_T_with_transpose, E, F, G)


if __name__ == "__main__":
    main()
