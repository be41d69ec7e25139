"""Micro-bench of the fused df32 select kernel vs lane-block width.

If the kernel is bound by dependent-op latency rather than VPU flops,
throughput should scale with block_b (wider slabs, same chain length)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from timeopt_tpu.models import get_system
from timeopt_tpu.solver.augmented import build_fused_inputs
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.ilqr import SolveOptions, broadcast_problem, resolve_q_reg
from timeopt_tpu.solver.linearize import linearize
from timeopt_tpu.ops.pallas_lft import propagator_select_lanes_df_fused

B = int(os.environ.get("PB", "1024"))


def main():
    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    opts = SolveOptions(method="propagator", max_iter=12, psd_levels=1)
    Tm = base.T_max

    @jax.jit
    def prep(probs):
        def one(p):
            U = jnp.broadcast_to(p.u_ref[None, :], (base.N, 4))
            X = rollout(system, p, p.x0, U)
            A, Bm = linearize(system.step, X, U, "ad")
            return build_fused_inputs(
                system, p, X[: Tm + 1], U[:Tm], A[:Tm], Bm[:Tm],
                q_reg=resolve_q_reg(opts, jnp.float32), rho_reg=opts.rho_reg,
                psd_levels=1, scale=True,
            )
        return jax.vmap(one)(probs)

    fi = prep(probs)
    fi = jax.tree.map(lambda x: jax.device_put(x), fi)

    import sys
    for bb in (int(sys.argv[1]) if len(sys.argv) > 1 else 128,):
        if B % bb:
            continue
        fn = jax.jit(
            lambda A, Bm, vecs, scal, Qq, R_inv, Lt: propagator_select_lanes_df_fused(
                A, Bm, vecs, scal, Qq, R_inv, Lt, t_min=int(__import__('os').environ.get('TMIN', base.T_min)), block_b=bb
            )
        )
        args = (fi.A, fi.B, fi.vecs, fi.scal, fi.Qq, fi.R_inv, fi.Lt)
        J = fn(*args)
        float(jnp.sum(jnp.where(jnp.isfinite(J), J, 0.0)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            J = fn(*args)
            float(jnp.sum(jnp.where(jnp.isfinite(J), J, 0.0)))
            ts.append(time.perf_counter() - t0)
        print(f"block_b={bb:4d}  {min(ts)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
