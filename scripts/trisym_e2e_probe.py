"""End-to-end validation of the trisym dense select: full HOP-DDP solves at
B=1024 quadrotor with trisym=True (production default) vs trisym=False (the
bit-identical-to-lanes op sequence). Compares per-problem T*, J, success.

Usage: python scripts/trisym_e2e_probe.py   Env: PB (default 1024), CASE.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from timeopt_tpu.models import get_system
from timeopt_tpu.ops import pallas_lft
from timeopt_tpu.solver.ilqr import (
    SolveOptions, _solve_traced, broadcast_problem, default_U_init,
)

B = int(os.environ.get("PB", "1024"))


def solve_all(probs, system, opts):
    @jax.jit
    def fn(probs):
        def one(p):
            res = _solve_traced(system, opts, p, default_U_init(p))
            from timeopt_tpu.ops.wrap import wrap_error
            eT = wrap_error(res.X[res.T_star] - p.xg, p.wrap_mask)
            err = jnp.sqrt(jnp.sum(jnp.square(eT)))
            return res.J_star, res.T_star, err
        return jax.vmap(one)(probs)

    J, T, err = fn(probs)
    return np.asarray(J), np.asarray(T), np.asarray(err) < 0.5


def main():
    system, mk = get_system(os.environ.get("CASE", "Quadrotor"))
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    if system.name == "Quadrotor":
        x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    else:
        x0s += np.asarray(system.sigma_x0, np.float32) * rng.standard_normal(
            x0s.shape
        ).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    opts = SolveOptions(method="propagator", max_iter=12, psd_levels=1)

    orig = pallas_lft.propagator_select_dense_df_fused_jit
    results = {}
    for name, tri in [("trisym", True), ("plain", False)]:
        pallas_lft.propagator_select_dense_df_fused_jit = functools.partial(
            orig, trisym=tri
        )
        try:
            results[name] = solve_all(probs, system, opts)
        finally:
            pallas_lft.propagator_select_dense_df_fused_jit = orig

    (Jt, Tt, st), (Jp, Tp, sp) = results["trisym"], results["plain"]
    t_match = int((Tt == Tp).sum())
    relJ = np.abs(Jt - Jp) / (np.abs(Jp) + 1e-30)
    print(
        f"B={B}  T* match {t_match}/{B}  success {st.mean():.4f} vs {sp.mean():.4f}"
        f"  J rel diff med {np.median(relJ):.2e} max {relJ.max():.2e}"
        f"  T* median {np.median(Tt):.0f} range [{Tt.min()}, {Tt.max()}]",
        flush=True,
    )
    if t_match < B:
        idx = np.nonzero(Tt != Tp)[0]
        for i in idx[:10]:
            print(f"  idx {i}: T* {Tp[i]} -> {Tt[i]}  J {Jp[i]:.6f} -> {Jt[i]:.6f}")


if __name__ == "__main__":
    main()
