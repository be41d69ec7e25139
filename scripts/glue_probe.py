"""Attribute the whole-iteration cost of the batched HOP-DDP solve.

Round-3 accounting said 645 ms / 12 iters = 54 ms/iter vs a 48.5 ms/iter
phase sum, leaving ~5 ms/iter of unattributed "glue" (VERDICT round 3,
weak #1). But the outer loop executes max_iter+1 body iterations (the
warm start is folded in as iteration 0), so the honest divisor is 13.
This probe settles it with a regression: time the full production solve
(early_exit off so every lane runs the exact budget) at several max_iter
values; the SLOPE is the true per-iteration cost including every piece of
glue (accept/reject bookkeeping, where-selects, convergence logic,
history scatter), and the INTERCEPT is the fixed per-solve overhead
(initial df rollout, result assembly, dispatch+sync).

Usage: python scripts/glue_probe.py   (on the TPU host)
Env: PB (batch, default 1024), CASE (default Quadrotor).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from timeopt_tpu.models import get_system
from timeopt_tpu.solver.ilqr import SolveOptions, broadcast_problem, solve_batch

B = int(os.environ.get("PB", "1024"))
CASE = os.environ.get("CASE", "Quadrotor")
ITERS = tuple(int(x) for x in os.environ.get("ITERS", "2,6,12").split(","))


def main():
    system, mk = get_system(CASE)
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    print(f"case={CASE} B={B} device={jax.devices()[0].platform}", flush=True)

    pts = []
    for mi in ITERS:
        opts = SolveOptions(method="propagator", max_iter=mi, early_exit=False)
        res = solve_batch(system, probs, options=opts)
        float(jnp.sum(res.J_star))  # compile+warm, sync via small transfer
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            res = solve_batch(system, probs, options=opts)
            float(jnp.sum(res.J_star))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        n_body = mi + 1  # warm start = iteration 0
        pts.append((n_body, t))
        print(
            f"max_iter={mi:3d} (body iters {n_body:3d})  t={t*1e3:8.1f} ms  "
            f"naive/iter={t/n_body*1e3:6.2f} ms  "
            f"T* median {int(np.median(np.asarray(res.T_star)))}",
            flush=True,
        )

    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    slope, intercept = np.polyfit(xs, ys, 1)
    print(
        f"\nregression: per-iteration {slope*1e3:.2f} ms  "
        f"fixed overhead {intercept*1e3:.1f} ms "
        f"(initial rollout + result assembly + dispatch/sync)",
        flush=True,
    )


if __name__ == "__main__":
    main()
