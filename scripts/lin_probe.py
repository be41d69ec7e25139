"""Linearization layout probe: batch-leading jacfwd (current) vs a
lanes-layout jvp formulation that keeps the batch axis minor end-to-end.

Hypothesis: linearize is ~60x off the VPU flop bound because every
(B, N, 12, 12)-shaped tensor pads its minor (12, 12) dims to (16, 128) tiles
(~10.7x HBM inflation), while (N, 12, 12, B) tensors pad only 12->16 on the
sublane dim (1.33x). The jvp math is identical; only the logical axis order
changes."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from timeopt_tpu.models import get_system
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.ilqr import broadcast_problem
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))


def timed(name, fn, *args, reps=3):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jax.tree.leaves(out)[0].sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(*args)
        for leaf in jax.tree.leaves(out):
            float(leaf.sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    N, n, m = base.N, base.n, base.m
    U = jnp.broadcast_to(probs.u_ref[:, None, :], (B, N, m))
    X = jax.jit(jax.vmap(lambda p, u: rollout(system, p, p.x0, u)))(probs, U)
    print(f"B={B} N={N}", flush=True)

    # (a) current: batch-leading jacfwd -> (B, N, n, n), (B, N, n, m)
    def lin_a(X, U):
        return jax.vmap(lambda x, u: linearize(system.step, x, u, "ad"))(X, U)

    A0, B0 = timed("jacfwd batch-leading (current)", lin_a, X, U)

    # (a2) current + transpose to lanes (what the select kernel consumes)
    def lin_a_t(X, U):
        A, Bm = lin_a(X, U)
        return jnp.transpose(A, (1, 2, 3, 0)), jnp.transpose(Bm, (1, 2, 3, 0))

    timed("jacfwd + transpose to (N,n,n,B)", lin_a_t, X, U)

    # (b) lanes: step vectorized over a trailing batch axis; 16 jvps
    def step_lanes(x, u):  # x: (n, B), u: (m, B)
        return jax.vmap(system.step, in_axes=-1, out_axes=-1)(x, u)

    def lin_lanes(X, U):
        # X: (B, N+1, n) -> (N, n, B); U -> (N, m, B)
        Xl = jnp.transpose(X[:, :-1, :], (1, 2, 0))
        Ul = jnp.transpose(U, (1, 2, 0))

        def jac_t(xl, ul):  # (n, B), (m, B) per time step
            def one_tangent(i):
                dx = jnp.zeros((n + m,), jnp.float32).at[i].set(1.0)
                tx = jnp.broadcast_to(dx[:n, None], (n, xl.shape[-1]))
                tu = jnp.broadcast_to(dx[n:, None], (m, xl.shape[-1]))
                _, d = jax.jvp(step_lanes, (xl, ul), (tx, tu))
                return d  # (n, B)

            cols = jax.vmap(one_tangent, out_axes=0)(jnp.arange(n + m))  # (n+m, n, B)
            return cols

        cols = jax.vmap(jac_t)(Xl, Ul)  # (N, n+m, n, B)
        A = jnp.transpose(cols[:, :n], (0, 2, 1, 3))  # (N, n, n, B)
        Bm = jnp.transpose(cols[:, n:], (0, 2, 1, 3))  # (N, n, m, B)
        return A, Bm

    A1, B1 = timed("jvp lanes-layout -> (N,n,n,B)", lin_lanes, X, U)

    # (b2) lanes + transpose back to batch-leading (for the XLA consumers)
    def lin_lanes_t(X, U):
        A, Bm = lin_lanes(X, U)
        return jnp.transpose(A, (3, 0, 1, 2)), jnp.transpose(Bm, (3, 0, 1, 2))

    timed("jvp lanes + transpose back to (B,N,n,n)", lin_lanes_t, X, U)

    # agreement
    A1b = np.transpose(np.asarray(A1), (3, 0, 1, 2))
    d = np.max(np.abs(A1b - np.asarray(A0)))
    print(f"max |A_lanes - A_current| = {d:.3e}")


if __name__ == "__main__" and not os.environ.get("MICRO"):
    main()


def micro():
    """What inside linearize costs: primal evals vs tangents vs assembly."""
    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n, m, N = base.n, base.m, base.N
    Xf = jnp.asarray(rng.standard_normal((B, N, n)), jnp.float32) * 0.1
    Uf = jnp.asarray(rng.standard_normal((B, N, m)), jnp.float32) * 0.1 + base.u_ref

    step2 = lambda x, u: system.step(x, u)

    def primal_only(X, U):
        f = jax.vmap(jax.vmap(step2))
        return f(X, U)

    timed("primal step eval (B*N sites)", primal_only, Xf, Uf)

    def primal_x16(X, U):
        f = jax.vmap(jax.vmap(step2))
        acc = 0.0
        for i in range(16):
            acc = acc + f(X + 1e-6 * i, U)
        return acc

    timed("16x primal evals", primal_x16, Xf, Uf)

    def jvp16_sum(X, U):
        f = jax.vmap(jax.vmap(step2))
        acc = 0.0
        for i in range(n + m):
            tx = jnp.zeros((n,), jnp.float32).at[jnp.minimum(i, n - 1)].set(
                jnp.where(i < n, 1.0, 0.0))
            tu = jnp.zeros((m,), jnp.float32).at[jnp.minimum(i - n, m - 1)].set(
                jnp.where(i >= n, 1.0, 0.0))
            _, d = jax.jvp(f, (X, U), (jnp.broadcast_to(tx, X.shape),
                                       jnp.broadcast_to(tu, U.shape)))
            acc = acc + d
        return acc

    timed("16 jvps, sum-reduced (no stack)", jvp16_sum, Xf, Uf)

    def xdot_jac(X, U):
        def jac_one(x, u):
            J = jax.jacfwd(lambda xx: system.xdot(xx, u))(x)
            return J
        return jax.vmap(jax.vmap(jac_one))(Xf, Uf)

    timed("jacfwd(xdot) x-only (12 tangents)", xdot_jac, Xf, Uf)


if __name__ == "__main__" and os.environ.get("MICRO"):
    micro()
