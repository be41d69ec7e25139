"""Backward-kernel batch-tile (block_b) sweep (VERDICT round-3 item 2).

The select kernel's ~20k-term step body fails the Mosaic compiler above
block_b=128 (scripts/select_block_probe.py); the backward body is ~3x
smaller, so wider slabs may compile — and if the measured 25-50% gap to
its VPU roofline is per-(tile, step) scheduling overhead, halving the tile
count halves that overhead. Times the raw lanes kernel on production-shape
quadrotor inputs (B=1024, N=160, T*=51) with in-graph repetition.

Usage: python scripts/bw_block_probe.py   (TPU host)
Env: PB (batch, 1024), REPS (8), BLOCKS (comma list, default 128,256,512).
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
from timeopt_tpu.ops.pallas_backward import backward_lanes_df
from timeopt_tpu.ops.wrap import wrap_error
from timeopt_tpu.solver.backward import stage_expansion
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.ilqr import broadcast_problem
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))
REPS = int(os.environ.get("REPS", "8"))
BLOCKS = tuple(int(x) for x in os.environ.get("BLOCKS", "128,256,512").split(","))


def main():
    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    N, n, m = base.N, base.n, base.m
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))

    U = jnp.broadcast_to(probs.u_ref[:, None, :], (B, N, m))
    X = jax.jit(jax.vmap(lambda p, u: rollout(system, p, p.x0, u)))(probs, U)
    A, Bm = jax.jit(jax.vmap(lambda x, u: linearize(system.step, x, u, "ad")))(X, U)

    @jax.jit
    @jax.vmap
    def build(p, Xi, Ui, Ai):
        e, du, lx, lu, l0, Qs = stage_expansion(system, p, Xi, Ui)
        eT = wrap_error(Xi[1:] - p.xg, p.wrap_mask)  # (N, n)
        QfeT = eT @ p.Qf.T
        eT_ok = jnp.ones((N,), Xi.dtype)
        step_ok = jnp.ones((N,), Xi.dtype)
        return lx, lu, Qs, QfeT, eT_ok, step_ok

    lx, lu, Qs, QfeT, eT_ok, step_ok = build(probs, X, U, A)
    Qf = jnp.broadcast_to(probs.Qf[0], (B,) + probs.Qf[0].shape)
    R = jnp.broadcast_to(probs.R[0], (B,) + probs.R[0].shape)
    Tb = jnp.full((B,), 51, jnp.int32)
    lm = jnp.full((B,), 1e-3, jnp.float32)
    print(f"B={B} N={N} T*=51 reps={REPS}", flush=True)

    ref = None
    for blk in BLOCKS:
        def prog(A, Bm, reps=REPS, blk=blk):
            def body(c, _):
                acc, k = c
                kap, K, ok = backward_lanes_df(
                    A + k * 1e-6, Bm, lx, lu, Qs, QfeT, eT_ok, step_ok,
                    Qf, R, Tb, lm, block_b=blk,
                )
                s = jnp.sum(jnp.abs(kap)) + jnp.sum(jnp.abs(K)) + jnp.sum(ok)
                return (acc + s, k + 1.0), None
            (acc, _), _ = lax.scan(body, (jnp.float32(0.0), jnp.float32(1.0)), None, length=reps)
            return acc

        try:
            jfn = jax.jit(prog)
            float(jfn(A, Bm))
        except Exception as ex:
            print(f"block_b={blk:4d}  COMPILE FAIL: {type(ex).__name__}: {str(ex)[:140]}", flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(A, Bm))
            ts.append(time.perf_counter() - t0)
        t1 = jax.jit(lambda A, Bm: prog(A, Bm, reps=1))
        float(t1(A, Bm))
        t1s = min(
            [
                (lambda s: (float(t1(A, Bm)), time.perf_counter() - s)[1])(
                    time.perf_counter()
                )
                for _ in range(3)
            ]
        )
        per = (min(ts) - t1s) / (REPS - 1)
        # bitwise check across block sizes (pure tiling change)
        kap, K, ok = jax.jit(
            lambda A, Bm, blk=blk: backward_lanes_df(
                A, Bm, lx, lu, Qs, QfeT, eT_ok, step_ok, Qf, R, Tb, lm, block_b=blk
            )
        )(A, Bm)
        if ref is None:
            ref = (np.asarray(kap), np.asarray(K), np.asarray(ok))
            bit = "ref"
        else:
            bit = (
                "bitwise=="
                if (np.array_equal(ref[0], np.asarray(kap)) and np.array_equal(ref[1], np.asarray(K)))
                else "DIFFERS"
            )
        print(f"block_b={blk:4d}  per-call {per*1e3:7.2f} ms  ({bit})", flush=True)


if __name__ == "__main__":
    main()
