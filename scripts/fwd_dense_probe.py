"""Dense-tile vs lanes-layout forward line-search kernel: bitwise + timing.

Companion to scripts/select_dense_probe.py / bw_dense_probe.py. The lanes
layout rides the A=5 alpha axis on sublanes (padded to 8, +60% on those
ops); the dense layout packs the batch into full (8, 128) tiles with the
state-row and alpha axes untiled. Shared rank-agnostic kernel body — the
outputs must be bit-identical.

Usage: python scripts/fwd_dense_probe.py
Env: PB (default 1024; must be a multiple of 1024 — the dense kernel's
tile constraint), REPS, CASE.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from timeopt_tpu.models import get_system
from timeopt_tpu.ops.pallas_forward import linesearch_dense_df, linesearch_lanes_df
from timeopt_tpu.solver.backward import backward_truncated
from timeopt_tpu.solver.cost import cost_true, rollout
from timeopt_tpu.solver.ilqr import broadcast_problem
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))
REPS = int(os.environ.get("REPS", "8"))
ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.05)


def timed_reps(fn, args, reps):
    def prog(X, rest):
        def body(c, _):
            acc, k = c
            Xn, Un, Jn, ok = fn(X + k * 1e-6, *rest)
            s = jnp.sum(jnp.where(jnp.isfinite(Jn), Jn, 0.0)) + jnp.sum(Xn) * 0.0
            return (acc + s, k + 1.0), None

        (acc, _), _ = lax.scan(body, (jnp.float32(0.0), jnp.float32(1.0)), None, length=reps)
        return acc

    jfn = jax.jit(prog)
    float(jfn(args[0], args[1:]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(args[0], args[1:]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    system, mk = get_system(os.environ.get("CASE", "Quadrotor"))
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n, m, N = system.n, system.m, base.N
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    Ts = jnp.asarray(48 + rng.integers(0, 8, size=B), jnp.int32)
    lm = jnp.full((B,), 1e-3, jnp.float32)

    @jax.jit
    def prep(probs, Ts, lm):
        def one(p, T, l):
            U = jnp.broadcast_to(p.u_ref[None, :], (N, m))
            X = rollout(system, p, p.x0, U)
            A, Bm = linearize(system.step, X, U, "ad")
            bw = backward_truncated(system, p, A, Bm, X, U, T, l)
            J_old = cost_true(system, p, X, U, T)
            return (X, U, bw.K, bw.kappa, T, J_old, p.xg, p.u_ref,
                    p.Q, p.R, p.Qf, p.w, p.wrap_mask.astype(jnp.float32))
        return jax.vmap(one)(probs, Ts, lm)

    args = prep(probs, Ts, lm)

    lanes = jax.jit(lambda *a: linesearch_lanes_df(system, ALPHAS, *a))
    dense = jax.jit(lambda *a: linesearch_dense_df(system, ALPHAS, *a))

    rl = [np.asarray(x) for x in lanes(*args)]
    rd = [np.asarray(x) for x in dense(*args)]
    ml, md = np.isfinite(rl[2]), np.isfinite(rd[2])
    bitwise = bool(
        (rl[0] == rd[0]).all() and (rl[1] == rd[1]).all()
        and (ml == md).all() and (rl[2][ml] == rd[2][md]).all()
        and (rl[3] == rd[3]).all()
    )
    print(f"B={B} N={N}  bitwise_equal={bitwise}  accept rate {rl[3].mean():.3f}", flush=True)
    if not bitwise:
        print(f"  max |dX| {np.abs(rl[0]-rd[0]).max():.3e}  J diff count {(rl[2]!=rd[2]).sum()}")

    for name, fn in [("lanes", lanes), ("dense", dense)]:
        t1 = timed_reps(fn, args, 1)
        tR = timed_reps(fn, args, REPS)
        per = (tR - t1) / (REPS - 1)
        print(f"{name:6s} per-linesearch {per*1e3:8.2f} ms  (1 rep {t1*1e3:7.1f}, {REPS} reps {tR*1e3:7.1f})", flush=True)


if __name__ == "__main__":
    main()
