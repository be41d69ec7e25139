"""TPU diagnostic: where does the f32 cartpole swing-up solve diverge from
the f64 oracle? (round-1 known gap: TPU f32 cartpole converged to T*=100
J=154 vs f64 T*=181 J=117.5; results/tpu_f32). CPU experiments
(scripts/cartpole_f32_probe.py) show plain-f32 *forward* noise is harmless —
with an f64 selection the f32 solve reproduces the f64 T_hist exactly — so
this probe checks the df32 Pallas selection and backward kernels on real
Mosaic hardware against f64-emulated oracles, then runs the full solves.

Run on the TPU host: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cartpole_tpu_diag.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from timeopt_tpu.models import cartpole
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.ilqr import SolveOptions, _select_curve, default_U_init, solve
from timeopt_tpu.solver.linearize import linearize


def main():
    print("devices:", jax.devices(), flush=True)
    system = cartpole.SYSTEM
    prob64 = cartpole.default_problem(dtype=jnp.float64)
    prob32 = cartpole.default_problem(dtype=jnp.float32)
    opts_xla = SolveOptions(max_iter=12, use_pallas=False)

    # ---- component check: selection curve on the initial nominal ----------
    U64 = default_U_init(prob64)
    X64 = rollout(system, prob64, prob64.x0, U64)
    A64, B64 = linearize(system.step, X64, U64, "ad")
    t0 = time.perf_counter()
    curve64 = _select_curve(system, prob64, opts_xla, X64, U64, A64, B64)
    curve64 = jax.block_until_ready(curve64)
    print(f"f64 XLA selection (emulated): {time.perf_counter()-t0:.1f}s", flush=True)

    cast = lambda a: a.astype(jnp.float32)  # noqa: E731
    X32, U32, A32, B32 = cast(X64), cast(U64), cast(A64), cast(B64)
    opts_pl = SolveOptions(max_iter=12, use_pallas=True)

    def sel32(X, U, A, B):
        return _select_curve(system, prob32, opts_pl, X, U, A, B)

    t0 = time.perf_counter()
    curve32 = jax.jit(jax.vmap(sel32))(
        X32[None], U32[None], A32[None], B32[None]
    )[0]
    curve32 = jax.block_until_ready(curve32)
    print(f"f32 Pallas selection: {time.perf_counter()-t0:.1f}s", flush=True)

    c64 = np.asarray(curve64, np.float64)
    c32 = np.asarray(curve32, np.float64)
    lo = prob64.T_min - 1
    sl = slice(lo, prob64.T_max)
    rel = np.abs(c32[sl] - c64[sl]) / np.maximum(np.abs(c64[sl]), 1e-12)
    a64, a32 = np.argmin(c64[sl]) + prob64.T_min, np.argmin(c32[sl]) + prob64.T_min
    print(
        f"selection curve: rel diff median {np.median(rel):.2e} max {rel.max():.2e}; "
        f"argmin f64={a64} f32={a32}",
        flush=True,
    )
    # J(T) values around both argmins for flatness context
    for t in sorted({int(a64), int(a32)}):
        print(f"  J64({t})={c64[t-1]:.6f}  J32({t})={c32[t-1]:.6f}")

    # ---- full solves -------------------------------------------------------
    t0 = time.perf_counter()
    res64 = jax.block_until_ready(solve(system, prob64, options=opts_xla))
    print(
        f"f64 solve ({time.perf_counter()-t0:.1f}s): T*={int(res64.T_star)} "
        f"J*={float(res64.J_star):.4f} T_hist={np.asarray(res64.T_hist)}",
        flush=True,
    )
    for label, o in (
        ("f32 pallas df-fwd off", SolveOptions(max_iter=12, df_forward="off")),
        ("f32 pallas df-fwd on ", SolveOptions(max_iter=12)),
    ):
        t0 = time.perf_counter()
        res = jax.block_until_ready(solve(system, prob32, options=o))
        print(
            f"{label} ({time.perf_counter()-t0:.1f}s): T*={int(res.T_star)} "
            f"J*={float(res.J_star):.4f} T_hist={np.asarray(res.T_hist)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
