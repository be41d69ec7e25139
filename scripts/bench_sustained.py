"""Sustained-stream benchmark (round-5 VERDICT item 5): strengthen the x8
projection by replacing PIPE=4 bursts with a continuous >= 60 s stream.

Runs the exact dp-sharded device-resident bench entry (bench.py) as a
continuous stream of B=1024 batches for DURATION seconds — hundreds of
batches with a sync every PIPE dispatches — and reports sustained solves/s
plus p50/p99 per-batch time (thermal/queue drift would show as a p99 tail
or a falling tail-half rate). Then one B=8192 single-chip point (the
batch-size linearity check the projection rests on).

Writes ONE JSON (results/bench_sustained_r05.json by default) and prints it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sustained.py
Env: DURATION_S (60), SUS_BATCH (1024), SUS_PIPE (4), BIG_BATCH (8192; 0
disables), SUS_OUT (output path).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import json
import os
import time

import numpy as np

DURATION = float(os.environ.get("DURATION_S", "60"))
BATCH = int(os.environ.get("SUS_BATCH", "1024"))
PIPE = int(os.environ.get("SUS_PIPE", "4"))
BIG = int(os.environ.get("BIG_BATCH", "8192"))
OUT = os.environ.get(
    "SUS_OUT",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "bench_sustained_r05.json",
    ),
)
MAX_ITER = 12


def make_bench(B):
    import jax
    import jax.numpy as jnp

    from timeopt_tpu.models import get_system
    from timeopt_tpu.ops.wrap import wrap_error
    from timeopt_tpu.parallel.mesh import make_mesh, shard_problems
    from timeopt_tpu.solver.ilqr import (
        SolveOptions, _solve_traced, broadcast_problem, default_U_init,
    )

    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    probs = shard_problems(probs, make_mesh())
    opts = SolveOptions(method="propagator", max_iter=MAX_ITER, psd_levels=1)

    @jax.jit
    def bench_fn(probs):
        def one(p):
            res = _solve_traced(system, opts, p, default_U_init(p))
            eT = wrap_error(res.X[res.T_star] - p.xg, p.wrap_mask)
            return res.J_star, res.T_star, jnp.sqrt(jnp.sum(jnp.square(eT)))

        J, T, err = jax.vmap(one)(probs)
        checksum = (
            jnp.sum(jnp.where(jnp.isfinite(J), J, 0.0))
            + jnp.sum(T)
            + jnp.sum(jnp.where(jnp.isfinite(err), err, 0.0))
        )
        return J, T, err, checksum

    return probs, bench_fn


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/timeopt_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    probs, bench_fn = make_bench(BATCH)
    t0 = time.perf_counter()
    out = bench_fn(probs)
    float(out[3])
    print(f"warmup (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

    group_times = []  # seconds per PIPE-group
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < DURATION:
        tg = time.perf_counter()
        for _ in range(PIPE):
            out = bench_fn(probs)
        float(out[3])  # in-order device: syncing the last syncs the group
        group_times.append(time.perf_counter() - tg)
    total_s = time.perf_counter() - t_start
    n_batches = len(group_times) * PIPE
    per_batch = np.asarray(group_times) / PIPE

    J = np.asarray(out[0])
    err = np.asarray(out[2])
    success = float(
        (np.isfinite(J) & np.isfinite(err) & (err <= 0.5)).mean()
    )
    half = len(per_batch) // 2
    record = {
        "metric": (
            f"quadrotor HOP-DDP sustained solves/s (continuous stream, "
            f"B={BATCH}, PIPE={PIPE}, {total_s:.0f}s, 1 chip, max_iter={MAX_ITER})"
        ),
        "value": round(n_batches * BATCH / total_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(n_batches * BATCH / total_s / (1.0 / 2.9), 1),
        "duration_s": round(total_s, 1),
        "n_batches": n_batches,
        "p50_batch_s": round(float(np.percentile(per_batch, 50)), 5),
        "p99_batch_s": round(float(np.percentile(per_batch, 99)), 5),
        "max_batch_s": round(float(per_batch.max()), 5),
        "first_half_solves_per_s": round(BATCH / float(per_batch[:half].mean()), 1),
        "second_half_solves_per_s": round(BATCH / float(per_batch[half:].mean()), 1),
        "success_rate": round(success, 4),
    }

    if BIG:
        probs_big, bench_big = make_bench(BIG)
        t0 = time.perf_counter()
        outb = bench_big(probs_big)
        float(outb[3])
        print(f"B={BIG} warmup: {time.perf_counter()-t0:.1f}s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outb = bench_big(probs_big)
            float(outb[3])
            times.append(time.perf_counter() - t0)
        tb = min(times)
        Jb = np.asarray(outb[0])
        errb = np.asarray(outb[2])
        record["big_batch"] = {
            "batch": BIG,
            "batch_time_s": round(tb, 4),
            "solves_per_s": round(BIG / tb, 2),
            "success_rate": round(
                float((np.isfinite(Jb) & np.isfinite(errb) & (errb <= 0.5)).mean()), 4
            ),
        }

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
