"""Where does the f32 iterate path fork from f64? (quadrotor mismatch study)

Prints per-iteration T_hist/J_hist for one problem on the current backend.
Run once on CPU (f64) and once on TPU (f32); compare histories to find the
first iteration whose accepted T* differs — tail_spike_probe.py established
that per-iterate selection is exact, so the fork must come from accept/
reject or alpha-choice knife-edges at f32 cost resolution.

Usage:
  PYTHONPATH=/root/repo python scripts/iterate_fork_probe.py cpu
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/iterate_fork_probe.py tpu
Env: IDX (default 5), OM_CASE (default Quadrotor).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os
import sys

import numpy as np

IDX = int(os.environ.get("IDX", "5"))
CASE = os.environ.get("OM_CASE", "Quadrotor")


def main(platform):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import scripts.oracle_match as om
    from timeopt_tpu.models import get_system
    from timeopt_tpu.solver.ilqr import SolveOptions, solve

    dtype = jnp.float64 if platform == "cpu" else jnp.float32
    system, mk = get_system(CASE)
    base = mk(dtype=dtype)
    x0s = om.make_x0s(np.asarray(mk(dtype=jnp.float64).x0, np.float64), system.sigma_x0)
    prob = base.replace(x0=jnp.asarray(x0s[IDX], dtype))
    res = solve(
        system, prob, options=SolveOptions(method="propagator", max_iter=12, psd_levels=1)
    )
    print(f"{platform} idx={IDX} T*={int(res.T_star)}", flush=True)
    print(f"{platform} T_hist:", np.asarray(res.T_hist), flush=True)
    print(f"{platform} J_hist:", np.round(np.asarray(res.J_hist, float), 4), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "cpu")
