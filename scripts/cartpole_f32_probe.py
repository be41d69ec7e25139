"""Probe: cartpole swing-up in f32 vs f64 on CPU — reproduces the known f32
forward-pass failure (DESIGN.md §4/§5) and validates the compensated df32
rollout (solver/rollout_df.py) at the component and solve level."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os

os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from timeopt_tpu.models import cartpole
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.rollout_df import rollout_df
from timeopt_tpu.solver.ilqr import SolveOptions, solve

# --- e2e f64 oracle ----------------------------------------------------------
opts64 = SolveOptions(max_iter=12, use_pallas=False)
prob64 = cartpole.default_problem(dtype=jnp.float64)
res64 = solve(cartpole.SYSTEM, prob64, options=opts64)
print(f"f64 oracle: T*={int(res64.T_star)} J*={float(res64.J_star):.4f}")

# --- component: open-loop rollout accuracy with the f64-optimal controls -----
U64 = res64.U
prob32 = cartpole.default_problem(dtype=jnp.float32)
X64 = rollout(cartpole.SYSTEM, prob64, prob64.x0, U64)
X32 = rollout(cartpole.SYSTEM, prob32, prob32.x0, U64.astype(jnp.float32))
Xdf = rollout_df(cartpole.SYSTEM, prob32, prob32.x0, U64.astype(jnp.float32))
T = int(res64.T_star)
for name, Xc in (("plain f32", X32), ("df32     ", Xdf)):
    err = np.asarray(Xc, np.float64) - np.asarray(X64)
    # compare modulo 2pi on the angle component
    err[:, 2] = (err[:, 2] + np.pi) % (2 * np.pi) - np.pi
    print(
        f"{name}: max|err| over [0,T*] = {np.abs(err[: T + 1]).max():.3e}, "
        f"at T* = {np.abs(err[T]).max():.3e}"
    )

# --- e2e: f32 solve with df forward + f64 selection (CPU stand-in for the
# df32 Pallas selection kernels) ----------------------------------------------
for label, o in (
    ("f32 plain          ", SolveOptions(max_iter=12, use_pallas=False, df_forward="off")),
    ("f32 df fwd         ", SolveOptions(max_iter=12, use_pallas=False)),
    (
        "f32 df fwd + sel64 ",
        SolveOptions(max_iter=12, use_pallas=False, select_dtype="float64"),
    ),
    (
        "f32 sel64 only     ",
        SolveOptions(max_iter=12, use_pallas=False, select_dtype="float64", df_forward="off"),
    ),
):
    res = solve(cartpole.SYSTEM, prob32, options=o)
    err = res.X[res.T_star] - prob32.xg
    from timeopt_tpu.ops.wrap import wrap_error

    fe = float(jnp.linalg.norm(wrap_error(err, prob32.wrap_mask)))
    print(
        f"{label}: T*={int(res.T_star)} J*={float(res.J_star):.4f} "
        f"final_err={fe:.4f} T_hist={np.asarray(res.T_hist)[:8]}"
    )
