"""Dense-tile vs lanes-layout backward kernel: bitwise check + timing.

Companion to scripts/select_dense_probe.py (see there for the layout
rationale). Quadrotor B=1024, realistic T* distribution from warm-started
inputs. In-graph repetition timing (tunnel dispatch costs ~28 ms/call).

Usage: python scripts/bw_dense_probe.py   Env: PB (default 1024), REPS.
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
from timeopt_tpu.ops.linalg import sym
from timeopt_tpu.ops.pallas_backward import backward_dense_df, backward_lanes_df
from timeopt_tpu.ops.wrap import wrap_error
from timeopt_tpu.solver.backward import stage_expansion
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.ilqr import broadcast_problem
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))
REPS = int(os.environ.get("REPS", "8"))


def timed_reps(fn, args, reps):
    def prog(A, rest):
        def body(c, _):
            acc, k = c
            kap, K, ok = fn(A + k * 1e-6, *rest)
            s = jnp.sum(kap) + jnp.sum(K) + jnp.sum(ok.astype(jnp.float32))
            return (acc + s, k + 1.0), None

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
    case = os.environ.get("CASE", "Quadrotor")
    system, mk = get_system(case)
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n, m, N = system.n, system.m, base.N
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    if case == "Quadrotor":
        x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    else:
        # per-case trial distribution (suite sigmas) — e.g.
        # CASE=PointMass_Navigation validates the k-varying-Hessian
        # (extra_stage_cost) backward through the same dense/trisym A/B
        x0s += np.asarray(system.sigma_x0, np.float32) * rng.standard_normal(
            x0s.shape
        ).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    Ts = jnp.asarray(48 + rng.integers(0, 8, size=B), jnp.int32)
    lm = jnp.full((B,), 1e-3, jnp.float32)

    @jax.jit
    def prep(probs, Ts, lm):
        def one(p, T, l):
            U = jnp.broadcast_to(p.u_ref[None, :], (N, m))
            X = rollout(system, p, p.x0, U)
            A, Bm = linearize(system.step, X, U, "ad")
            e, du, lx, lu, _, Qs = stage_expansion(system, p, X, U)
            # mirror backward_truncated's symmetry preconditioning exactly
            # (a bitwise no-op for the built-in models' symmetric Q/R, but
            # keeps the probe's trisym preconditions identical to production)
            Qs = sym(Qs)
            QfT = sym(p.Qf)
            eTs = wrap_error(X[1:] - p.xg, p.wrap_mask)
            QfeT = eTs @ QfT.T
            eT_ok = jnp.all(jnp.isfinite(eTs), -1).astype(jnp.float32)
            s_ok = (jnp.all(jnp.isfinite(e), -1) & jnp.all(jnp.isfinite(du), -1)).astype(jnp.float32)
            return A, Bm, lx, lu, Qs, QfeT, eT_ok, s_ok, QfT, sym(p.R), T, l
        return jax.vmap(one)(probs, Ts, lm)

    args = prep(probs, Ts, lm)

    lanes = jax.jit(lambda *a: backward_lanes_df(*a))
    dense = jax.jit(lambda *a: backward_dense_df(*a, trisym=False))
    tri = jax.jit(lambda *a: backward_dense_df(*a, trisym=True))

    kl, Kl, okl = (np.asarray(x) for x in lanes(*args))
    kd, Kd, okd = (np.asarray(x) for x in dense(*args))
    bitwise = bool((kl == kd).all() and (Kl == Kd).all() and (okl == okd).all())
    print(f"B={B} N={N}  bitwise_equal={bitwise}", flush=True)
    if not bitwise:
        print(f"  max |dkap| {np.abs(kl-kd).max():.3e}  max |dK| {np.abs(Kl-Kd).max():.3e}  ok diff {(okl!=okd).sum()}")

    kt, Kt, okt = (np.asarray(x) for x in tri(*args))
    relK = np.abs(Kt - Kd) / (np.abs(Kd) + 1e-30)
    print(
        f"trisym vs dense: max |dkap| {np.abs(kt-kd).max():.3e}  K rel max "
        f"{relK.max():.2e}  ok agree {(okt == okd).sum()}/{B}", flush=True
    )

    for name, fn in [("lanes", lanes), ("dense", dense), ("trisym", tri)]:
        t1 = timed_reps(fn, args, 1)
        tR = timed_reps(fn, args, REPS)
        per = (tR - t1) / (REPS - 1)
        print(f"{name:6s} per-backward {per*1e3:8.2f} ms  (1 rep {t1*1e3:7.1f}, {REPS} reps {tR*1e3:7.1f})", flush=True)


if __name__ == "__main__":
    main()
