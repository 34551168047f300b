"""Separate per-dispatch (tunnel) latency from true on-device epoch time.

Every prior measurement paid one host->TPU round trip per timed call; if that
costs ~40 ms, ALL kernel timings are latency-dominated and the chip's real
throughput is unknown.  Here K epochs are chained inside ONE jit (key fold_in
per step, nlike summed on device), so a single dispatch covers K epochs:
time(K) = tunnel + K * t_epoch.  The slope is the truth.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig, build_epoch_fn

B, D, R = 8192, 20, 100


def main():
    like = get_likelihood("gaussian", D)
    calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)

    key = jax.random.PRNGKey(0)
    r0 = 0.1 * math.sqrt(D) * 1.5
    bound = -0.5 * (r0 / 0.1) ** 2 - D * (math.log(0.1) + 0.5 * math.log(2 * math.pi))

    # build every input ON DEVICE (a multi-MB host upload can wedge the
    # tunnel; only the key crosses the wire)
    @jax.jit
    def make_args(k):
        sr = 0.1 * jax.random.normal(k, (B, D))
        # clamp inside the contour: production seeds are live points
        rr = jnp.sqrt((sr**2).sum(axis=1, keepdims=True))
        seeds = 0.5 + sr * jnp.minimum(1.0, 0.9 * r0 / rr)
        bounds = jnp.full((B,), bound, jnp.float32)
        chol = jnp.broadcast_to(0.1 * jnp.eye(D, dtype=jnp.float32), (B, D, D))
        valid = jnp.ones((B,), bool)
        return seeds, bounds, chol, valid

    args = jax.block_until_ready(make_args(key))

    import sys as _sys
    engines = _sys.argv[1:] or ["pallas", "scan"]
    for engine in engines:
        cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,),
                          num_repeats=(R,), engine=engine)
        raw = build_epoch_fn(calc, cfg)

        def chained(K):
            @jax.jit
            def f(k, s, b, c, v):
                def step(carry, i):
                    kk = jax.random.fold_in(k, i)
                    packed = raw(kk, s, b, c, v)
                    n = packed[:, -2:-1].astype(jnp.int32).sum()
                    return carry + n, None
                tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.int32),
                                      jnp.arange(K))
                return tot
            return f

        results = {}
        for K in (1, 4, 8):
            f = chained(K)
            n = int(jax.block_until_ready(f(key, *args)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                n = int(np.asarray(f(key, *args)))
                ts.append(time.perf_counter() - t0)
            results[K] = (min(ts), n)
            print(f"{engine:6s} K={K}: {min(ts)*1e3:8.2f} ms total, "
                  f"evals={n}", flush=True)
        (t1, n1), (t8, n8) = results[1], results[8]
        slope = (t8 - t1) / 7.0
        ev_per_epoch = (n8 - n1) / 7.0
        print(f"{engine:6s} => tunnel ~{(t1 - slope)*1e3:.1f} ms, "
              f"device {slope*1e3:.2f} ms/epoch, "
              f"TRUE {ev_per_epoch/slope/1e6:.0f}M evals/s", flush=True)


if __name__ == "__main__":
    main()
