"""Exact body-iteration count + structural floor of the v3 kernel.

Answers: of the ~34 ms kernel-only time at (B=8192, D=20, R=100),
how much is (a) number of while-body iterations x per-iteration cost,
and (b) the grid/streaming skeleton (cheap=True replaces the 4-micro-step
body with a trivial increment, keeping grid, ring streaming, and flushes)?
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig

from v3_instr import build_epoch_fn_pallas_v3 as build_instr

B, D, R = 8192, 20, 100


def main():
    like = get_likelihood("gaussian", D)
    calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
    cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,),
                      num_repeats=(R,), engine="pallas")

    key = jax.random.PRNGKey(0)
    seeds = 0.5 + 0.1 * jax.random.normal(key, (B, D))
    r0 = 0.1 * math.sqrt(D) * 1.5
    bound = -0.5 * (r0 / 0.1) ** 2 - D * (math.log(0.1) + 0.5 * math.log(2 * math.pi))
    bounds = jnp.full((B,), bound, jnp.float32)
    chol = jnp.broadcast_to(0.1 * jnp.eye(D, dtype=jnp.float32), (B, D, D))
    valid = jnp.ones((B,), bool)
    args = jax.block_until_ready(jax.device_put((seeds, bounds, chol, valid)))

    for cheap in (False, True):
        raw = build_instr(calc, cfg, cheap=cheap)

        @jax.jit
        def f(k, s, b, c, v):
            packed = raw(k, s, b, c, v)
            nlike = packed[:, -2:-1].astype(jnp.int32).sum()
            iters = raw.last_iters[:, 0, 0].astype(jnp.int64).sum()
            return nlike, iters

        (n, it) = jax.block_until_ready(f(key, *args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            n, it = jax.block_until_ready(f(key, *args))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        n, it = int(n), int(it)
        label = "cheap" if cheap else "real "
        per_body = t / max(it, 1) * 1e6
        print(f"{label}: {t*1e3:8.2f} ms  body_iters={it}  micro={it*4}  "
              f"evals={n}  {per_body:.2f} us/body ({per_body/4:.2f} us/micro)",
              flush=True)


if __name__ == "__main__":
    main()
