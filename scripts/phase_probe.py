"""Phase breakdown of the batched quadrotor solve on TPU, with reliable
timing (scalar host transfer forces completion — block_until_ready is not a
reliable barrier on the axon remote backend)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from timeopt_tpu.models import get_system
from timeopt_tpu.solver.augmented import build_augmented, build_terminal_factors
from timeopt_tpu.solver.backward import backward_truncated
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.forward import forward_linesearch
from timeopt_tpu.solver.horizon import (
    lft_elements,
    lft_prefix_scan,
    propagator_J_curve_factored,
)
from timeopt_tpu.solver.ilqr import broadcast_problem, default_U_init
from timeopt_tpu.solver.linearize import linearize

B = int(__import__("os").environ.get("PB", "1024"))


def timed(name, f, *args, reps=3):
    g = jax.jit(lambda *a: jax.tree.map(lambda x: jnp.sum(jnp.abs(x.astype(jnp.float32))), f(*a)))
    out = g(*args)
    float(jax.tree.leaves(out)[0])  # compile+run
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = g(*args)
        for leaf in jax.tree.leaves(out):
            float(leaf)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:9.1f} ms", flush=True)


def main():
    system, mk = get_system("Quadrotor")
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    print(f"B={B}", flush=True)

    U = jax.vmap(default_U_init)(probs) if False else jnp.broadcast_to(
        probs.u_ref[:, None, :], (B, base.N, 4)
    )

    vroll = jax.vmap(lambda p, u: rollout(system, p, p.x0, u))
    X = jax.jit(vroll)(probs, U)
    timed("rollout", vroll, probs, U)

    vlin = jax.vmap(lambda x, u: linearize(system.step, x, u, "ad"))
    A, Bm = jax.jit(vlin)(X, U)
    timed("linearize(ad)", vlin, X, U)

    Tm = base.T_max

    def vblocks(p, x, u, a, b):
        return jax.vmap(
            lambda pp, xx, uu, aa, bb: build_augmented(
                system, pp, xx[: Tm + 1], uu[:Tm], aa[:Tm], bb[:Tm], psd_levels=1
            )
        )(p, x, u, a, b)

    blocks = jax.jit(vblocks)(probs, X, U, A, Bm)
    timed("build_augmented", vblocks, probs, X, U, A, Bm)

    vterm = jax.vmap(lambda p, x, s: build_terminal_factors(p, x[: Tm + 1], s=s))
    C = jax.jit(vterm)(probs, X, blocks.s)
    timed("terminal_factors", vterm, probs, X, blocks.s)

    velems = jax.vmap(lambda b: lft_elements(b, psd_levels=1))
    elems = jax.jit(velems)(blocks)
    timed("lft_elements", velems, blocks)

    vscan = jax.vmap(lambda e: lft_prefix_scan(e, mode="sequential", psd_levels=1))
    pre = jax.jit(vscan)(elems)
    timed("prefix_scan(seq)", vscan, elems)

    vscan_a = jax.vmap(lambda e: lft_prefix_scan(e, mode="associative", psd_levels=1))
    timed("prefix_scan(assoc)", vscan_a, elems)

    vquery = jax.vmap(lambda p, c: propagator_J_curve_factored(p, c, psd_levels=1))
    timed("terminal_queries", vquery, pre, C)

    T_star = jnp.full((B,), 51, jnp.int32)
    vbw = jax.vmap(
        lambda p, a, b, x, u, t: backward_truncated(system, p, a, b, x, u, t, jnp.float32(1e-3))
    )
    bw = jax.jit(vbw)(probs, A, Bm, X, U, T_star)
    timed("backward", vbw, probs, A, Bm, X, U, T_star)

    vfw = jax.vmap(
        lambda p, x, u, K, k, t: forward_linesearch(system, p, x, u, K, k, t)
    )
    timed("forward_linesearch", vfw, probs, X, U, bw.K, bw.kappa, T_star)


if __name__ == "__main__":
    main()
