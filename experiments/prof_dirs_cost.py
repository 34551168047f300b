"""On-chip cost of the epoch's non-kernel stages: lane keys, make_directions,
and the (B,R,D)->(R,D,S,LANE)/(n_chunks,R,D+1,SC,LANE) layout transposes."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math, time
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.ops.slice_kernel import _lane_keys
from polychordlite_tpu.ops.directions import make_directions

B, D, R = 8192, 20, 100
LANE, SC = 128, 64
S = B // LANE
key = jax.random.PRNGKey(0)
chol = jnp.broadcast_to(0.1*jnp.eye(D, dtype=jnp.float32), (B, D, D))
chol = jax.block_until_ready(jax.device_put(chol))

def timeit_chain(fn, K=8):
    @jax.jit
    def chained(k):
        def step(c, i):
            kk = jax.random.fold_in(k, i)
            return c + fn(kk), None
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(K))
        return tot
    @jax.jit
    def one(k):
        return fn(k)
    float(np.asarray(one(key))); float(np.asarray(chained(key)))
    t1 = min(__import__('time').perf_counter() - t0 for t0 in [0])  # placeholder
    ts1, tsK = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(one(key))); ts1.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); float(np.asarray(chained(key))); tsK.append(time.perf_counter()-t0)
    return (min(tsK) - min(ts1)) / (K - 1)

def keys_only(kk):
    dk, _ = _lane_keys(kk, B, None)
    return jax.random.key_data(dk).astype(jnp.float32).sum()

def dirs_only(kk):
    dk, _ = _lane_keys(kk, B, None)
    nh, w, sp = make_directions(dk, chol, grade_dims=(D,), num_repeats=(R,), n_dims=D)
    return nh.sum() + w.sum()

def dirs_transpose_v3(kk):
    dk, _ = _lane_keys(kk, B, None)
    nh, w, sp = make_directions(dk, chol, grade_dims=(D,), num_repeats=(R,), n_dims=D)
    nhat_t = nh.astype(jnp.float32).transpose(1, 2, 0).reshape(R, D, S, LANE)
    w_t = w.astype(jnp.float32).T.reshape(R, S, LANE)
    return nhat_t.sum() + w_t.sum()

def dirs_stream_v4(kk):
    dk, _ = _lane_keys(kk, B, None)
    nh, w, sp = make_directions(dk, chol, grade_dims=(D,), num_repeats=(R,), n_dims=D)
    n_chunks = S // SC
    stream = jnp.concatenate([
        nh.astype(jnp.float32).reshape(n_chunks, SC, LANE, R, D).transpose(0, 3, 4, 1, 2),
        w.astype(jnp.float32).reshape(n_chunks, SC, LANE, R, 1).transpose(0, 3, 4, 1, 2),
    ], axis=2)
    return stream.sum()

for name, fn in [("lane_keys", keys_only), ("make_directions", dirs_only),
                 ("dirs+transpose(v3)", dirs_transpose_v3),
                 ("dirs+stream(v4)", dirs_stream_v4)]:
    dt = timeit_chain(fn)
    print(f"{name:22s} {dt*1e3:8.2f} ms/epoch", flush=True)
