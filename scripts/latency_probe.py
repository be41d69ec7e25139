"""Single-solve latency probe: throughput-mode batch-of-1 (sequential df32
Pallas select) vs latency-mode assoc_df (time-on-lanes Hillis-Steele select,
solver/select_assoc.py).

The axon tunnel adds ~28 ms fixed dispatch+sync overhead per call, so each
configuration is timed as a `lax.scan` of R full solves (x0 perturbed per
rep so CSE can't collapse them) under ONE dispatch; per-solve latency is
(t(R_hi) - t(R_lo)) / (R_hi - R_lo).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/latency_probe.py
Env: CASE (default Quadrotor), R_LO/R_HI (default 2/10), MAX_ITER (12),
MODES (comma list: seq,assoc; default both).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os
import time

import jax
import jax.numpy as jnp
from jax import lax

# persistent compilation cache (same dir as bench.py): repeat invocations
# skip the ~100 s first compiles
_cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/timeopt_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from timeopt_tpu.models import get_system
from timeopt_tpu.solver.ilqr import SolveOptions, _solve_traced, default_U_init

CASE = os.environ.get("CASE", "Quadrotor")
R_LO = int(os.environ.get("R_LO", "2"))
R_HI = int(os.environ.get("R_HI", "10"))
MAX_ITER = int(os.environ.get("MAX_ITER", "12"))


def make_prog(system, prob, opts, reps):
    """One dispatch running `reps` sequential full solves (batch-of-1 vmap so
    the sequential mode reaches the Pallas kernels, identical wrapping for
    both modes)."""
    U0 = default_U_init(prob)

    def prog(x0):
        def body(c, _):
            acc, k = c
            p = prob.replace(x0=x0 + k * 1e-6)
            probs = jax.tree.map(lambda x: x[None], p)
            res = jax.vmap(lambda pp, uu: _solve_traced(system, opts, pp, uu))(
                probs, U0[None]
            )
            return (acc + res.J_star[0], k + 1.0), (res.T_star[0], res.J_star[0])

        (acc, _), (Ts, Js) = lax.scan(
            body, (x0.dtype.type(0.0), x0.dtype.type(1.0)), None, length=reps
        )
        return acc, Ts[0], Js[0]

    return jax.jit(prog)


def timed(jfn, x0):
    out = jfn(x0)  # compile + warm
    t_star, j_star = int(out[1]), float(out[2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(x0)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), t_star, j_star


def main():
    system, mk = get_system(CASE)
    prob = mk(dtype=jnp.float32)
    print(f"case={CASE} platform={jax.devices()[0].platform} max_iter={MAX_ITER} "
          f"R={R_LO}/{R_HI}", flush=True)

    modes = os.environ.get("MODES", "seq,assoc").split(",")
    table = {
        "seq": ("seq (batch-of-1 Pallas)", SolveOptions(max_iter=MAX_ITER), {}),
        "assoc": ("assoc_df (time-on-lanes)",
                  SolveOptions(max_iter=MAX_ITER, scan_mode="assoc_df"), {}),
        # round-5 latency candidates (VERDICT item 3): opt-in kernel knobs on
        # the batch-of-1 lanes tile, applied by monkeypatching the module jit
        # entries the custom_vmap dispatch imports — the default lanes path
        # stays frozen (invariant 5); any adopted variant gets its own
        # routing + oracle check before shipping.
        "seq_trisym": ("seq + trisym lanes", SolveOptions(max_iter=MAX_ITER),
                       {"select": {"trisym": True}, "backward": {"trisym": True}}),
        "seq_qf32": ("seq + f32 query", SolveOptions(max_iter=MAX_ITER),
                     {"select": {"query_df": False}}),
        "seq_trisym_qf32": ("seq + trisym + f32 query",
                            SolveOptions(max_iter=MAX_ITER),
                            {"select": {"trisym": True, "query_df": False},
                             "backward": {"trisym": True}}),
    }
    import functools

    from timeopt_tpu.ops import pallas_backward, pallas_lft

    orig_sel = pallas_lft.propagator_select_lanes_df_fused_jit
    orig_bw = pallas_backward.backward_lanes_df_jit
    for mode in modes:
        name, opts, patches = table[mode.strip()]
        if "select" in patches:
            pallas_lft.propagator_select_lanes_df_fused_jit = functools.partial(
                orig_sel, **patches["select"]
            )
        if "backward" in patches:
            pallas_backward.backward_lanes_df_jit = functools.partial(
                orig_bw, **patches["backward"]
            )
        try:
            t_lo, t_star, j_star = timed(make_prog(system, prob, opts, R_LO), prob.x0)
            t_hi, _, _ = timed(make_prog(system, prob, opts, R_HI), prob.x0)
        finally:
            pallas_lft.propagator_select_lanes_df_fused_jit = orig_sel
            pallas_backward.backward_lanes_df_jit = orig_bw
        per = (t_hi - t_lo) / (R_HI - R_LO)
        print(f"  {name:28s} T*={t_star:4d} J*={j_star:12.4f} "
              f"latency/solve={per * 1e3:8.2f} ms  (t_lo={t_lo:.3f}s t_hi={t_hi:.3f}s)",
              flush=True)


if __name__ == "__main__":
    main()
