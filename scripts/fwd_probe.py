"""Forward line-search layout probe (round 3).

Measures the per-iteration device time of the batched forward line search in
its two layouts at suite shape (quadrotor, B=1024, 5 alphas):

- old:    batch-leading (A, B, n) vmap path (production until round 3)
- kernel: fused Pallas rollout kernel (ops/pallas_forward.py)

(A pure-XLA trailing-batch variant was also measured: 8.08 ms vs old's
7.81 — layout padding is NOT what dominates this phase; per-scan-step
dispatch and df op count are, hence the kernel.)

plus a value-agreement check between the two. Timing uses the in-graph
repetition pattern of scripts/phase_probe.py (the axon tunnel adds ~28 ms
fixed dispatch+sync overhead per call, so single-call wall times are
meaningless).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fwd_probe.py
Env: PB (batch, default 1024), REPS (default 8), CASE (default Quadrotor).
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
from timeopt_tpu.solver.backward import backward_truncated
from timeopt_tpu.solver.cost import cost_true, rollout
from timeopt_tpu.ops.pallas_forward import linesearch_lanes_df
from timeopt_tpu.solver.ilqr import SolveOptions, broadcast_problem
from timeopt_tpu.solver.linearize import linearize
from timeopt_tpu.solver.rollout_df import rollout_with_gains_df

B = int(os.environ.get("PB", "1024"))
REPS = int(os.environ.get("REPS", "8"))
ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.05)


def timed_reps(phase, X, U, reps):
    def prog(X, U):
        def body(c, _):
            acc, k = c
            out = phase(X + k * 1e-6, U)
            s = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(out))
            return (acc + s, k + 1.0), None

        (acc, _), _ = lax.scan(body, (jnp.float32(0.0), jnp.float32(1.0)), None, length=reps)
        return acc

    jfn = jax.jit(prog)
    float(jfn(X, U))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(X, U))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    system, mk = get_system(os.environ.get("CASE", "Quadrotor"))
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n, m, N = base.n, base.m, base.N
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))

    U = jnp.broadcast_to(probs.u_ref[:, None, :], (B, N, m))
    X = jax.jit(jax.vmap(lambda p, u: rollout(system, p, p.x0, u)))(probs, U)
    A, Bm = jax.jit(jax.vmap(lambda x, u: linearize(system.step, x, u, "ad")))(X, U)
    lm = jnp.full((B,), 1e-3, jnp.float32)
    Tb = jnp.full((B,), 51, jnp.int32)
    bw = jax.jit(
        jax.vmap(lambda p, a, b, x, u, t, l: backward_truncated(system, p, a, b, x, u, t, l))
    )(probs, A, Bm, X, U, Tb, lm)
    J_old = jax.jit(jax.vmap(lambda p, x, u, t: cost_true(system, p, x, u, t)))(
        probs, X, U, Tb
    )
    K, kap = bw.K, bw.kappa
    print(f"B={B} N={N} reps={REPS}", flush=True)

    def old_one(p, X1, U1, K1, kap1, T1, J1):
        def try_alpha(a):
            Xn, Un = rollout_with_gains_df(system, p, X1, U1, K1, kap1, T1, a)
            finite = jnp.all(jnp.isfinite(Xn))
            Jn = cost_true(system, p, Xn, Un, T1)
            return Xn, Un, jnp.where(finite, Jn, jnp.inf)

        a_vec = jnp.asarray(ALPHAS, X1.dtype)
        Xs, Us, Js = jax.vmap(try_alpha)(a_vec)
        improved = Js < J1
        accepted = jnp.any(improved)
        idx = jnp.argmax(improved)
        return (
            jnp.where(accepted, Xs[idx], X1),
            jnp.where(accepted, Us[idx], U1),
            jnp.where(accepted, Js[idx], J1),
            accepted,
        )

    def ph_old(Xp, Up):
        out = jax.vmap(old_one)(probs, Xp, Up, K, kap, Tb, J_old)
        return (out[0], out[2], out[3])

    def ph_kernel(Xp, Up):
        out = linesearch_lanes_df(
            system, ALPHAS, Xp, Up, K, kap, Tb, J_old,
            probs.xg, probs.u_ref, probs.Q, probs.R, probs.Qf, probs.w, probs.wrap_mask,
        )
        return (out[0], out[2], out[3])

    # value agreement first
    o = jax.jit(lambda X, U: jax.vmap(old_one)(probs, X, U, K, kap, Tb, J_old))(X, U)
    t = jax.jit(
        lambda X, U: linesearch_lanes_df(
            system, ALPHAS, X, U, K, kap, Tb, J_old,
            probs.xg, probs.u_ref, probs.Q, probs.R, probs.Qf, probs.w, probs.wrap_mask,
        )
    )(X, U)
    Jo, Jt = np.asarray(o[2]), np.asarray(t[2])
    ao, at = np.asarray(o[3]), np.asarray(t[3])
    agree = (ao == at).mean()
    relJ = np.abs(Jo - Jt) / np.maximum(np.abs(Jo), 1e-9)
    print(
        f"agreement: accepted {agree:.4f}  J rel diff median {np.median(relJ):.2e} "
        f"max {relJ.max():.2e}",
        flush=True,
    )

    for name, ph in [("old", ph_old), ("kernel", ph_kernel)]:
        t1 = timed_reps(ph, X, U, 1)
        tR = timed_reps(ph, X, U, REPS)
        per = (tR - t1) / (REPS - 1)
        print(
            f"{name:8s} per-call {per*1e3:8.2f} ms   (1 rep {t1*1e3:7.1f} ms, "
            f"{REPS} reps {tR*1e3:7.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
