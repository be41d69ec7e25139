"""Mixed-precision select error budget (round-5 VERDICT item 2): can parts
of the df32 select kernel carry plain-f32 arithmetic without moving T*?

Two knobs on the fused select kernels (ops/pallas_lft.py):
- query_df=False: the terminal query runs in plain f32 (hi parts only).
  Query errors feed ONLY the J(T) output — they never enter the df32
  prefix carry, so they do not compound over the N steps. Saves the
  query's ~25% of df terms.
- element_df=False: the per-step LFT element is built in f32 and promoted.
  Element errors act as input perturbations of the (df-exact) compose
  chain, but amplified ~kappa(Q_aug) ~ 1e4..1e5 by the rank-1 inverse
  update. Saves another ~24% of df terms.

Protocol:
1. kernel-level timing at B=1024 (in-graph repetition — single calls are
   meaningless under the ~28 ms tunnel dispatch): trisym baseline vs each
   knob, plus J-curve rel-diff and raw argmin agreement on iterate-0 curves.
2. end-to-end: full B=1024 HOP-DDP solves with the knob monkeypatched into
   the production dense routing — per-problem final T*/J/success vs the
   unmodified production path (the trisym_e2e_probe pattern).

Adoption bar (VERDICT): only if the 640-problem oracle stays 640/640
exact-or-tied afterwards (oracle_match OM_PATH=dense with the knob on);
otherwise this probe's numbers are the measured-dead-end record.

Usage: python scripts/mixedprec_probe.py [kernel|e2e|all]
Env: PB (default 1024), REPS (default 8), CASE (default Quadrotor),
MODES (comma list of qf32,ef32,both; default all three).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/timeopt_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from timeopt_tpu.models import get_system
from timeopt_tpu.ops import pallas_lft
from timeopt_tpu.ops.pallas_lft import propagator_select_dense_df_fused
from timeopt_tpu.solver.augmented import build_fused_inputs
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.ilqr import (
    SolveOptions, _solve_traced, broadcast_problem, default_U_init,
    resolve_q_reg,
)
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))
REPS = int(os.environ.get("REPS", "8"))
CASE = os.environ.get("CASE", "Quadrotor")

VARIANTS = {
    "qf32": {"query_df": False},
    "ef32": {"element_df": False},
    "both": {"query_df": False, "element_df": False},
}
MODES = [m.strip() for m in os.environ.get("MODES", "qf32,ef32,both").split(",")]


def _setup():
    system, mk = get_system(CASE)
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    if CASE == "Quadrotor":
        x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    else:
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
            return build_fused_inputs(
                system, p, X[: Tm + 1], U[:Tm], A[:Tm], Bm[:Tm],
                q_reg=resolve_q_reg(opts, jnp.float32), rho_reg=opts.rho_reg,
                psd_levels=1, scale=True,
            )
        return jax.vmap(one)(probs)

    fi = prep(probs)
    args = (fi.A, fi.B, fi.vecs, fi.scal, fi.Qq, fi.R_inv, fi.Lt)
    return system, probs, opts, args, int(base.T_min)


def timed_reps(fn, args, reps):
    def prog(A, rest):
        def body(c, _):
            acc, k = c
            out = fn(A + k * 1e-6, *rest)
            return (acc + jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)), k + 1.0), None

        (acc, _), _ = lax.scan(
            body, (jnp.float32(0.0), jnp.float32(1.0)), None, length=reps
        )
        return acc

    jfn = jax.jit(prog)
    float(jfn(args[0], args[1:]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(args[0], args[1:]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def kernel_probe():
    _, _, _, args, t_min = _setup()
    base_fn = jax.jit(
        lambda *a: propagator_select_dense_df_fused(*a, t_min=t_min, trisym=True)
    )
    J0 = np.asarray(base_fn(*args))
    m0 = np.isfinite(J0)
    am0 = np.where(m0, J0, np.inf).argmin(axis=1)

    t1 = timed_reps(base_fn, args, 1)
    tR = timed_reps(base_fn, args, REPS)
    per0 = (tR - t1) / (REPS - 1)
    print(f"B={B} case={CASE}  baseline trisym per-select {per0*1e3:8.2f} ms",
          flush=True)

    for name in MODES:
        kw = VARIANTS[name]
        fn = jax.jit(
            lambda *a, _kw=kw: propagator_select_dense_df_fused(
                *a, t_min=t_min, trisym=True, **_kw
            )
        )
        J = np.asarray(fn(*args))
        m1 = np.isfinite(J)
        rel = np.abs(np.where(m0 & m1, J - J0, 0.0)) / (
            np.abs(np.where(m0, J0, 1.0)) + 1e-30
        )
        am1 = np.where(m1, J, np.inf).argmin(axis=1)
        dT = np.abs(am0 - am1)
        t1 = timed_reps(fn, args, 1)
        tR = timed_reps(fn, args, REPS)
        per = (tR - t1) / (REPS - 1)
        print(
            f"{name:5s} per-select {per*1e3:8.2f} ms ({per/per0*100:5.1f}% of base)"
            f"  J rel med {np.median(rel):.2e} max {rel.max():.2e}"
            f"  iter0-argmin agree {(am0 == am1).sum()}/{B}  dT max {dT.max()}",
            flush=True,
        )


def solve_all(probs, system, opts):
    from timeopt_tpu.ops.wrap import wrap_error

    @jax.jit
    def fn(probs):
        def one(p):
            res = _solve_traced(system, opts, p, default_U_init(p))
            eT = wrap_error(res.X[res.T_star] - p.xg, p.wrap_mask)
            err = jnp.sqrt(jnp.sum(jnp.square(eT)))
            return res.J_star, res.T_star, err
        return jax.vmap(one)(probs)

    J, T, err = fn(probs)
    return np.asarray(J), np.asarray(T), np.asarray(err) < 0.5


def e2e_probe():
    system, probs, opts, _, _ = _setup()
    orig = pallas_lft.propagator_select_dense_df_fused_jit

    results = {}
    for name in ["prod"] + MODES:
        kw = VARIANTS.get(name, {})
        pallas_lft.propagator_select_dense_df_fused_jit = functools.partial(
            orig, **kw
        )
        try:
            results[name] = solve_all(probs, system, opts)
        finally:
            pallas_lft.propagator_select_dense_df_fused_jit = orig

    Jp, Tp, sp = results["prod"]
    print(
        f"e2e B={B} case={CASE}  prod: success {sp.mean():.4f} "
        f"T* median {np.median(Tp):.0f}",
        flush=True,
    )
    for name in MODES:
        J, T, s = results[name]
        match = int((T == Tp).sum())
        relJ = np.abs(J - Jp) / (np.abs(Jp) + 1e-30)
        print(
            f"{name:5s} T* match {match}/{B}  success {s.mean():.4f}"
            f"  J rel med {np.median(relJ):.2e} max {relJ.max():.2e}",
            flush=True,
        )
        if match < B:
            idx = np.nonzero(T != Tp)[0]
            dts = (T.astype(int) - Tp.astype(int))[idx]
            print(f"   mism idx {idx[:8]}  dT {dts[:8]}  |dT| max {np.abs(dts).max()}")


if __name__ == "__main__":
    mode = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if mode in ("kernel", "all"):
        kernel_probe()
    if mode in ("e2e", "all"):
        e2e_probe()
