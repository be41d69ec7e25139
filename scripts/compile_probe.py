"""Cold-compile attribution for the batched HOP-DDP program.

BENCH_r01 measured a 527 s first call at B=1024 (VERDICT round 1, weak #3).
This probe times `jax.jit(...).lower(args).compile()` for the full solve and
for each phase in isolation, so the cost can be attributed (Mosaic kernel
builds vs the XLA main program vs program duplication: the warm-start emits
a second copy of select/backward/forward outside the loop body).

The persistent compilation cache is NOT enabled here — every timing is a
true cold compile within this process (re-running the script re-pays them;
run components selectively via COMPONENTS).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_probe.py
Env: PB (batch, default 1024); COMPONENTS (comma list, default all:
     select,backward,forward,solve,solve_xla).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # self-locating: run bare, no PYTHONPATH needed

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from timeopt_tpu.models import get_system
from timeopt_tpu.solver.backward import backward_truncated
from timeopt_tpu.solver.cost import rollout
from timeopt_tpu.solver.forward import forward_linesearch
from timeopt_tpu.solver.ilqr import (
    SolveOptions,
    _select_curve,
    _solve_traced,
    broadcast_problem,
    default_U_init,
)
from timeopt_tpu.solver.linearize import linearize

B = int(os.environ.get("PB", "1024"))
COMPONENTS = os.environ.get(
    "COMPONENTS", "select,backward,forward,solve,solve_xla"
).split(",")


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(
        f"{name:12s} trace+lower {t_lower:7.1f} s   compile {t_compile:7.1f} s",
        flush=True,
    )


def main():
    system, mk = get_system(os.environ.get("CASE", "Quadrotor"))
    base = mk(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n, m, N = base.n, base.m, base.N
    x0s = np.tile(np.asarray(base.x0, np.float32), (B, 1))
    x0s[:, :3] += 0.4 * rng.standard_normal((B, 3)).astype(np.float32)
    probs = broadcast_problem(base, B).replace(x0=jnp.asarray(x0s))
    opts = SolveOptions(max_iter=12, psd_levels=1)

    U = jnp.broadcast_to(probs.u_ref[:, None, :], (B, N, m))
    X = jax.jit(jax.vmap(lambda p, u: rollout(system, p, p.x0, u)))(probs, U)
    A, Bm = jax.jit(jax.vmap(lambda x, u: linearize(system.step, x, u, "ad")))(X, U)
    lm = jnp.full((B,), 1e-3, jnp.float32)
    Tb = jnp.full((B,), 51, jnp.int32)
    print(f"B={B} N={N} components={COMPONENTS}", flush=True)

    if "select" in COMPONENTS:
        timed_compile(
            "select",
            lambda Xp, Up: jax.vmap(
                lambda p, x, u, a, b: _select_curve(system, p, opts, x, u, a, b)
            )(probs, Xp, Up, A, Bm),
            X, U,
        )
    if "backward" in COMPONENTS:
        timed_compile(
            "backward",
            lambda Xp, Up: jax.vmap(
                lambda p, a, b, x, u, t, l: backward_truncated(
                    system, p, a, b, x, u, t, l
                )
            )(probs, A, Bm, Xp, Up, Tb, lm),
            X, U,
        )
    if "forward" in COMPONENTS:
        K = jnp.zeros((B, N, m, n), jnp.float32)
        kap = jnp.zeros((B, N, m), jnp.float32)
        timed_compile(
            "forward",
            lambda Xp, Up: jax.vmap(
                lambda p, x, u, Kk, kk, t: forward_linesearch(
                    system, p, x, u, Kk, kk, t, alphas=opts.alphas, df_forward=True
                )
            )(probs, Xp, Up, K, kap, Tb),
            X, U,
        )
    if "solve" in COMPONENTS:
        timed_compile(
            "solve",
            lambda ps, us: jax.vmap(lambda p, u: _solve_traced(system, opts, p, u))(
                ps, us
            ),
            probs, jax.vmap(default_U_init)(probs),
        )
    if "solve_xla" in COMPONENTS:
        # use_pallas=False: numerically wrong at f32 on TPU, but compiles the
        # same outer program with the XLA select/backward — isolates the
        # Mosaic share of the full-solve compile.
        opts_x = SolveOptions(max_iter=12, psd_levels=1, use_pallas=False, df_forward="off")
        timed_compile(
            "solve_xla",
            lambda ps, us: jax.vmap(lambda p, u: _solve_traced(system, opts_x, p, u))(
                ps, us
            ),
            probs, jax.vmap(default_U_init)(probs),
        )


if __name__ == "__main__":
    main()
