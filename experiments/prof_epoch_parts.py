"""Where does the 46 ms bench epoch actually go?

bench.py (B=8192, 20-D gaussian, R=100) measures ~96M evals/s on chip, i.e.
~46 ms per epoch for ~4.5M counted evals — but the v3 kernel's while loop
should account for only a few ms of that.  This profile times each stage of
the epoch separately on-device:

  1. _lane_keys           (per-lane fold_in)
  2. make_directions      (Haar bases + shuffle + whiten)
     2a. gaussian draw + Gram-Schmidt only
     2b. permutation + gather only
     2c. whiten/norm only
  3. pallas kernel        (with directions precomputed as inputs)
  4. full epoch           (reference total)

Run: JAX_PLATFORMS=<tpu|cpu> python experiments/prof_epoch_parts.py
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig, build_epoch_fn, _lane_keys
from polychordlite_tpu.ops.directions import make_directions, _haar_bases, _gram_schmidt

B, D, R = 8192, 20, 100


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


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
    seeds, bounds, chol, valid = jax.block_until_ready(
        jax.device_put((seeds, bounds, chol, valid)))

    # 1. lane keys
    lane_fn = jax.jit(lambda k: _lane_keys(k, B, None))
    t, (dir_keys, _) = timeit(lane_fn, key)
    print(f"1. _lane_keys:            {t*1e3:8.2f} ms")
    dir_keys = jax.block_until_ready(dir_keys)

    # 2. make_directions (jitted already)
    md = functools.partial(make_directions, grade_dims=(D,), num_repeats=(R,), n_dims=D)
    t, (nhats, ws, speeds) = timeit(lambda k, c: md(k, c), dir_keys, chol)
    print(f"2. make_directions:       {t*1e3:8.2f} ms")

    # 2a. gaussian + gram-schmidt
    @jax.jit
    def bases_only(keys):
        def per_chain(ck):
            ks = jax.random.split(ck, 2)
            return _haar_bases(ks[0], D, R)
        return jax.vmap(per_chain)(keys)
    t, raw = timeit(bases_only, dir_keys)
    print(f"2a. haar bases only:      {t*1e3:8.2f} ms")

    @jax.jit
    def gauss_only(keys):
        def per_chain(ck):
            ks = jax.random.split(ck, 2)
            n_b = -(-R // D)
            return jax.random.normal(ks[0], (n_b, D, D))
        return jax.vmap(per_chain)(keys)
    t, _ = timeit(gauss_only, dir_keys)
    print(f"2a'. gaussian draw only:  {t*1e3:8.2f} ms")

    # 2b. permutation + gather
    @jax.jit
    def perm_only(keys, nh):
        def per_chain(ck, nhat):
            ks = jax.random.split(ck, 2)
            pt = jax.random.permutation(ks[-1], R - 1) + 1
            perm = jnp.concatenate([jnp.zeros((1,), pt.dtype), pt])
            return nhat[perm]
        return jax.vmap(per_chain)(keys, nh)
    t, _ = timeit(perm_only, dir_keys, raw)
    print(f"2b. permutation+gather:   {t*1e3:8.2f} ms")

    # 2c. whiten
    @jax.jit
    def whiten_only(nh, L):
        wh = jnp.einsum("brd,bed->bre", nh, L)
        norms = jnp.sqrt(jnp.sum(wh * wh, axis=2))
        return wh / jnp.maximum(norms, 1e-300)[:, :, None], 3.0 * norms
    t, _ = timeit(whiten_only, raw, chol)
    print(f"2c. whiten+norm:          {t*1e3:8.2f} ms")

    # 3. kernel with precomputed directions — monkeypatch make_directions
    import polychordlite_tpu.ops.pallas_slice_v3 as v3
    nhats, ws, speeds = jax.block_until_ready((nhats, ws, speeds))

    import polychordlite_tpu.ops.directions as dirs_mod
    orig = dirs_mod.make_directions
    const = (nhats.astype(jnp.float32), ws.astype(jnp.float32), speeds)

    def fake_make_directions(*a, **kw):
        return const
    dirs_mod.make_directions = fake_make_directions
    try:
        raw_epoch = v3.build_epoch_fn_pallas_v3(calc, cfg)

        @jax.jit
        def kernel_only(k, s, b, c, v):
            packed = raw_epoch(k, s, b, c, v)
            return packed[:, -2:-1].astype(jnp.int32).sum(axis=0)
        t, n = timeit(kernel_only, key, seeds, bounds, chol, valid)
        evs = int(np.asarray(n).sum())
        print(f"3. v3 kernel only:        {t*1e3:8.2f} ms   "
              f"({evs} evals -> {evs/t/1e6:.0f}M evals/s)")
    finally:
        dirs_mod.make_directions = orig

    # 4. full epoch
    raw_epoch_full = build_epoch_fn(calc, cfg)

    @jax.jit
    def full(k, s, b, c, v):
        packed = raw_epoch_full(k, s, b, c, v)
        return packed[:, -2:-1].astype(jnp.int32).sum(axis=0)
    t, n = timeit(full, key, seeds, bounds, chol, valid)
    evs = int(np.asarray(n).sum())
    print(f"4. full epoch:            {t*1e3:8.2f} ms   "
          f"({evs} evals -> {evs/t/1e6:.0f}M evals/s)")


if __name__ == "__main__":
    main()
