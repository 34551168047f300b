"""Round-4 slope-based breakdown of the (fast) directions path on chip.

make_directions with the lane-batched Pallas Gram-Schmidt measures
2.72 ms/epoch (of a 4.3 ms epoch).  This isolates the stages to find the
next lever: normals draw, +transpose to lane-minor, +GS kernel,
+back-transpose, full make_directions (adds one-hot shuffle at HIGHEST +
whiten + norms), +v4 stream layout.

Run on the TPU: python experiments/prof_dirs_parts2.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import time

import jax
import jax.numpy as jnp
import numpy as np

from polychordlite_tpu.ops.slice_kernel import _lane_keys
from polychordlite_tpu.ops.directions import make_directions
from polychordlite_tpu.ops.pallas_dirs import gram_schmidt_lanes

B, D, R = 8192, 20, 100
NB = -(-R // D)
LANE, SC = 128, 64
S = B // LANE
chol = jax.block_until_ready(jax.device_put(
    jnp.broadcast_to(0.1 * jnp.eye(D, dtype=jnp.float32), (B, D, D))))


def timeit_chain(fn, K=8):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chained(k):
        def step(c, i):
            return c + fn(jax.random.fold_in(k, i)), None
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(K))
        return tot

    @jax.jit
    def one(k):
        return fn(k)

    float(np.asarray(one(key))); float(np.asarray(chained(key)))
    ts1, tsK = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(one(key))); ts1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(np.asarray(chained(key))); tsK.append(time.perf_counter() - t0)
    return (min(tsK) - min(ts1)) / (K - 1)


def keys_and_gauss(kk):
    dk, _ = _lane_keys(kk, B, None)
    ak = jax.vmap(lambda c: jax.random.split(c, 2))(dk)
    g = jax.vmap(lambda k: jax.random.normal(k, (NB, D, D)))(ak[:, 0])
    return ak, g


def normals(kk):
    _, g = keys_and_gauss(kk)
    return g.sum()


def normals_t(kk):
    _, g = keys_and_gauss(kk)
    return g.transpose(1, 2, 3, 0).sum()


def gs_kernel(kk):
    _, g = keys_and_gauss(kk)
    return gram_schmidt_lanes(g.transpose(1, 2, 3, 0)).sum()


def gs_back(kk):
    _, g = keys_and_gauss(kk)
    qt = gram_schmidt_lanes(g.transpose(1, 2, 3, 0))
    return qt.transpose(3, 0, 2, 1).reshape(B, NB * D, D)[:, :R].sum()


def dirs_full(kk):
    dk, _ = _lane_keys(kk, B, None)
    nh, w, sp = make_directions(
        dk, chol, grade_dims=(D,), num_repeats=(R,), n_dims=D
    )
    return nh.sum() + w.sum()


def dirs_stream(kk):
    dk, _ = _lane_keys(kk, B, None)
    nh, w, sp = make_directions(
        dk, chol, grade_dims=(D,), num_repeats=(R,), n_dims=D
    )
    n_chunks = S // SC
    stream = jnp.concatenate(
        [
            nh.astype(jnp.float32).reshape(n_chunks, SC, LANE, R, D)
            .transpose(0, 3, 4, 1, 2),
            w.astype(jnp.float32).reshape(n_chunks, SC, LANE, R, 1)
            .transpose(0, 3, 4, 1, 2),
        ],
        axis=2,
    )
    return stream.sum()


if __name__ == "__main__":
    for name, fn in (
        ("normals", normals),
        ("normals+transpose", normals_t),
        ("+GS kernel", gs_kernel),
        ("+back-transpose", gs_back),
        ("make_directions full", dirs_full),
        ("+v4 stream layout", dirs_stream),
    ):
        print(f"{name:22s} {timeit_chain(fn)*1e3:7.2f} ms/epoch", flush=True)
