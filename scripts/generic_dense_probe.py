"""Generic (k-varying Q_aug) select kernel: dense-tile vs lanes on hardware.

Companion to scripts/select_dense_probe.py for the extra_stage_cost path
(PointMass_Navigation — the one reference system using the hook). Verifies
on real TPU that the dense kernel with trisym=False is bit-identical to the
lanes kernel (same op sequence claim), measures the trisym J deviation and
argmin agreement, and times all three.

Usage: python scripts/generic_dense_probe.py   Env: PB (default 1024), REPS.
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
from timeopt_tpu.ops.pallas_lft import (
    propagator_select_dense_df,
    propagator_select_lanes_df,
)
from timeopt_tpu.solver.augmented import build_augmented, build_terminal_factors
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.ilqr import SolveOptions, broadcast_problem, resolve_q_reg
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))
REPS = int(os.environ.get("REPS", "8"))


def timed_reps(fn, args, reps):
    def prog(A, rest):
        def body(c, _):
            acc, k = c
            out = fn(A + k * 1e-6, *rest)
            return (acc + jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)), k + 1.0), None

        (acc, _), _ = lax.scan(body, (jnp.float32(0.0), jnp.float32(1.0)), None, length=reps)
        return acc

    jfn = jax.jit(prog)
    float(jfn(args[0], args[1:]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(args[0], args[1:]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    system, mk = get_system(os.environ.get("CASE", "PointMass_Navigation"))
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s += np.asarray(system.sigma_x0, np.float32) * rng.standard_normal(
        x0s.shape
    ).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    opts = SolveOptions(method="propagator", max_iter=12, psd_levels=1)
    Tm = base.T_max

    @jax.jit
    def prep(probs):
        def one(p):
            U = jnp.broadcast_to(p.u_ref[None, :], (base.N, system.m))
            X = rollout(system, p, p.x0, U)
            A, Bm = linearize(system.step, X, U, "ad")
            blocks = build_augmented(
                system, p, X[: Tm + 1], U[:Tm], A[:Tm], Bm[:Tm],
                q_reg=resolve_q_reg(opts, jnp.float32), rho_reg=opts.rho_reg,
                psd_levels=1, scale=True,
            )
            C = build_terminal_factors(p, X[: Tm + 1], rho_reg=opts.rho_reg, s=blocks.s)
            return blocks.A_aug, blocks.B_aug, blocks.Q_aug, blocks.R_inv, C
        return jax.vmap(one)(probs)

    args = prep(probs)
    t_min = int(base.T_min)

    lanes = jax.jit(lambda *a: propagator_select_lanes_df(*a, t_min=t_min))
    dense = jax.jit(
        lambda *a: propagator_select_dense_df(*a, t_min=t_min, trisym=False)
    )
    tri = jax.jit(
        lambda *a: propagator_select_dense_df(*a, t_min=t_min, trisym=True)
    )

    Jl = np.asarray(lanes(*args))
    Jd = np.asarray(dense(*args))
    ml, md = np.isfinite(Jl), np.isfinite(Jd)
    bitwise = bool((ml == md).all() and (Jl[ml] == Jd[md]).all())
    print(f"{system.name} B={B} N={args[0].shape[1]} t_min={t_min}  bitwise_equal={bitwise}", flush=True)
    if not bitwise:
        d = np.abs(np.where(ml & md, Jl - Jd, 0.0))
        print(f"  max abs diff {d.max():.3e}  n_diff {(d > 0).sum()}")

    Jt = np.asarray(tri(*args))
    mt = np.isfinite(Jt)
    rel = np.abs(np.where(md & mt, Jt - Jd, 0.0)) / (np.abs(np.where(md, Jd, 1.0)) + 1e-30)
    exact = int(((Jt == Jd) | (~md & ~mt)).sum())
    arg_d = np.where(md, Jd, np.inf).argmin(axis=1)
    arg_t = np.where(mt, Jt, np.inf).argmin(axis=1)
    print(
        f"trisym vs dense: max rel {rel.max():.2e}  f32-exact {exact}/{Jt.size}"
        f"  raw-argmin agree {(arg_d == arg_t).sum()}/{B}", flush=True
    )

    for name, fn in [("lanes", lanes), ("dense", dense), ("trisym", tri)]:
        t1 = timed_reps(fn, args, 1)
        tR = timed_reps(fn, args, REPS)
        per = (tR - t1) / (REPS - 1)
        print(f"{name:6s} per-select {per*1e3:8.2f} ms  (1 rep {t1*1e3:7.1f}, {REPS} reps {tR*1e3:7.1f})", flush=True)


if __name__ == "__main__":
    main()
