"""TPU probe: fp32 throughput + fp32-vs-fp64 T* agreement on the quadrotor.

Run on the TPU host (no JAX_PLATFORMS override). Produces the numbers that
decide the bench configuration: batch-size scaling, psd_levels impact, and
whether fp32 selection matches fp64 (the 'bit-matched T*' requirement of
BASELINE.md).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from timeopt_tpu.models import get_system
from timeopt_tpu.solver.ilqr import SolveOptions, broadcast_problem, solve_batch


def make_batch(B, dtype, sigma=0.4, seed=0):
    system, mk = get_system("Quadrotor")
    base = mk(dtype=dtype)
    rng = np.random.default_rng(seed)
    x0s = np.tile(np.asarray(base.x0, np.float64), (B, 1))
    x0s[:, :3] += sigma * rng.standard_normal((B, 3))
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s, dtype))
    return system, probs


def run(B, dtype, opts, reps=3, tag=""):
    system, probs = make_batch(B, dtype)
    t0 = time.perf_counter()
    res = solve_batch(system, probs, options=opts)
    jax.block_until_ready(res)
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = solve_batch(system, probs, options=opts)
        jax.block_until_ready(res)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(
        f"[{tag}] B={B} dtype={np.dtype(dtype).name} compile+1={t_compile:.1f}s "
        f"run={t*1e3:.1f}ms -> {B/t:.0f} solves/s",
        flush=True,
    )
    return res, t


def main():
    jax.config.update("jax_enable_x64", True)  # needed for the f64 agreement run; f32 arrays stay f32
    print("devices:", jax.devices(), flush=True)
    opts1 = SolveOptions(method="propagator", max_iter=12, psd_levels=1)
    opts2 = SolveOptions(method="propagator", max_iter=12, psd_levels=2)

    # scaling in batch size, fp32
    for B in (64, 256, 1024):
        run(B, jnp.float32, opts1, tag="f32/lv1")

    # psd_levels cost
    run(256, jnp.float32, opts2, tag="f32/lv2")

    # fp32 vs fp64 T* agreement (f64 runs emulated on TPU — slow, small B)
    B = 64
    r32, _ = run(B, jnp.float32, opts1, tag="f32/agree")
    r64, _ = run(B, jnp.float64, opts1, reps=1, tag="f64/agree")
    T32 = np.asarray(r32.T_star)
    T64 = np.asarray(r64.T_star)
    match = (T32 == T64).mean()
    print(f"T* match f32 vs f64: {match:.3f}  (diffs: {np.abs(T32-T64).max()})")
    J32, J64 = np.asarray(r32.J_star), np.asarray(r64.J_star)
    rel = np.abs(J32 - J64) / np.maximum(np.abs(J64), 1e-9)
    print(f"J* rel diff: median {np.median(rel):.2e} max {rel.max():.2e}")


if __name__ == "__main__":
    main()
