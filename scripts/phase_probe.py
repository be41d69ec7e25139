"""Per-phase device-time probe for the batched HOP-DDP iteration.

The axon tunnel adds ~28 ms of fixed dispatch+sync overhead per jitted call
(measured: a trivial X+1 at B=1024 costs the same as a 2048^3 matmul), so
per-phase wall timing of single calls is meaningless. This probe times each
phase of the solver iteration body (linearize, select, backward, forward)
with R in-graph repetitions under one dispatch — a `lax.scan` whose carry
perturbs the inputs each rep so CSE can't collapse the reps — and reports
(t(R) - t(0)) / R as the true per-call device time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/phase_probe.py
Env: PB (batch, default 1024), REPS (default 8).
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
from timeopt_tpu.solver.cost import argmin_T, rollout
from timeopt_tpu.solver.forward import forward_linesearch
from timeopt_tpu.solver.ilqr import SolveOptions, _select_curve, broadcast_problem
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))
REPS = int(os.environ.get("REPS", "8"))


def timed_reps(name, phase, X, U, reps):
    """phase: (X, U) -> scalar-reducible pytree. Times a scan of `reps`
    invocations with input perturbation; one device sync at the end."""

    def prog(X, U):
        def body(c, _):
            acc, k = c
            out = phase(X + k * 1e-6, U)
            s = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(out))
            return (acc + s, k + 1.0), None

        (acc, _), _ = lax.scan(body, (jnp.float32(0.0), jnp.float32(1.0)), None, length=reps)
        return acc

    jfn = jax.jit(prog, static_argnums=())
    float(jfn(X, U))  # compile+warm
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
    opts = SolveOptions(max_iter=12)

    U = jnp.broadcast_to(probs.u_ref[:, None, :], (B, N, m))
    X = jax.jit(jax.vmap(lambda p, u: rollout(system, p, p.x0, u)))(probs, U)
    A, Bm = jax.jit(
        jax.vmap(lambda x, u: linearize(system.step, x, u, "ad"))
    )(X, U)
    lm = jnp.full((B,), 1e-3, jnp.float32)
    print(f"B={B} N={N} reps={REPS}", flush=True)

    def ph_linearize(Xp, Up):
        return jax.vmap(lambda x, u: linearize(system.step, x, u, "ad"))(Xp, Up)

    def ph_select(Xp, Up):
        return jax.vmap(
            lambda p, x, u, a, b: _select_curve(system, p, opts, x, u, a, b)
        )(probs, Xp, Up, A, Bm)

    def ph_backward(Xp, Up):
        Tb = jnp.full((B,), 51, jnp.int32)
        bw = jax.vmap(
            lambda p, a, b, x, u, t, l: backward_truncated(system, p, a, b, x, u, t, l)
        )(probs, A, Bm, Xp, Up, Tb, lm)
        return (bw.K, bw.kappa)

    def ph_forward(Xp, Up):
        Tb = jnp.full((B,), 51, jnp.int32)
        bw = jax.vmap(
            lambda p, a, b, x, u, t, l: backward_truncated(system, p, a, b, x, u, t, l)
        )(probs, A, Bm, Xp, Up, Tb, lm)
        ls = jax.vmap(
            lambda p, x, u, K, k, t: forward_linesearch(
                system, p, x, u, K, k, t, alphas=opts.alphas, df_forward=True
            )
        )(probs, Xp, Up, bw.K, bw.kappa, Tb)
        return (ls.J, ls.X)

    base_t = {}
    for name, ph in [
        ("linearize", ph_linearize),
        ("select", ph_select),
        ("backward", ph_backward),
        ("backward+forward", ph_forward),
    ]:
        t1 = timed_reps(name, ph, X, U, 1)
        tR = timed_reps(name, ph, X, U, REPS)
        per = (tR - t1) / (REPS - 1)
        base_t[name] = per
        print(f"{name:20s} per-call {per*1e3:8.2f} ms   (1 rep {t1*1e3:7.1f} ms, {REPS} reps {tR*1e3:7.1f} ms)", flush=True)

    fwd = base_t["backward+forward"] - base_t["backward"]
    tot = base_t["linearize"] + base_t["select"] + base_t["backward"] + fwd
    print(f"forward (diff)       per-call {fwd*1e3:8.2f} ms")
    print(f"sum of phases        {tot*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
