"""How early does the quadrotor batch converge? Compares solve outputs and
wall-clock at different max_iter budgets — if max_iter=k reproduces the
max_iter=12 (T*, J*) for (almost) all lanes, a batch-wide early exit
(lax.while_loop on all-done) would save the difference."""

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


def main():
    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))

    ref = None
    for mi in (12, 10, 8, 6, 4):
        opts = SolveOptions(method="propagator", max_iter=mi, psd_levels=1)
        res = solve_batch(system, probs, options=opts)
        float(jnp.sum(res.T_star))  # sync
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solve_batch(system, probs, options=opts)
            float(jnp.sum(res.T_star))
            ts.append(time.perf_counter() - t0)
        T = np.asarray(res.T_star)
        J = np.asarray(res.J_star)
        nacc = np.asarray(res.n_accept)
        if ref is None:
            ref = (T, J)
        tmatch = (T == ref[0]).mean()
        jrel = np.abs(J - ref[1]) / np.maximum(np.abs(ref[1]), 1e-9)
        print(
            f"max_iter={mi:2d}  {min(ts)*1e3:7.1f} ms  {B/min(ts):6.0f} solves/s  "
            f"T*match(vs12)={tmatch:.3f}  Jrel med={np.median(jrel):.1e} "
            f"max={jrel.max():.1e}  n_acc med={np.median(nacc):.0f} max={nacc.max()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
