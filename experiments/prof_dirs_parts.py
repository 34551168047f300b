"""On-chip breakdown of make_directions: normals, Gram-Schmidt, shuffle
(permutation+gather), whiten."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import time
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.ops.slice_kernel import _lane_keys
from polychordlite_tpu.ops.directions import _gram_schmidt

B, D, R = 8192, 20, 100
NB = -(-R // D)  # 5
key = jax.random.PRNGKey(0)
chol = jax.block_until_ready(jax.device_put(
    jnp.broadcast_to(0.1*jnp.eye(D, dtype=jnp.float32), (B, D, D))))

def timeit_chain(fn, K=8):
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
        t0 = time.perf_counter(); float(np.asarray(one(key))); ts1.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); float(np.asarray(chained(key))); tsK.append(time.perf_counter()-t0)
    return (min(tsK) - min(ts1)) / (K - 1)

def keysplit(kk):
    dk, _ = _lane_keys(kk, B, None)
    ks = jax.vmap(lambda c: jax.random.split(c, 2))(dk)
    return jax.random.key_data(ks).astype(jnp.float32).sum()

def normals(kk):
    dk, _ = _lane_keys(kk, B, None)
    ks = jax.vmap(lambda c: jax.random.split(c, 2))(dk)
    g = jax.vmap(lambda k2: jax.random.normal(k2[0], (NB, D, D)))(ks)
    return g.sum()

def gs(kk):
    dk, _ = _lane_keys(kk, B, None)
    ks = jax.vmap(lambda c: jax.random.split(c, 2))(dk)
    g = jax.vmap(lambda k2: jax.random.normal(k2[0], (NB, D, D)))(ks)
    q = _gram_schmidt(g.reshape(B*NB, D, D))
    return q.sum()

def cholqr2(kk):
    dk, _ = _lane_keys(kk, B, None)
    ks = jax.vmap(lambda c: jax.random.split(c, 2))(dk)
    g = jax.vmap(lambda k2: jax.random.normal(k2[0], (NB, D, D)))(ks)
    a = g.reshape(B*NB, D, D)
    for _ in range(2):
        gram = jnp.einsum("bij,bik->bjk", a, a)
        L = jnp.linalg.cholesky(gram)
        a = jax.lax.linalg.triangular_solve(
            L, a, left_side=False, lower=True, transpose_a=True)
    return a.sum()

def perm_gather(kk):
    dk, _ = _lane_keys(kk, B, None)
    ks = jax.vmap(lambda c: jax.random.split(c, 2))(dk)
    g = jax.vmap(lambda k2: jax.random.normal(k2[0], (NB, D, D)))(ks)
    nh = jnp.swapaxes(g, -1, -2).reshape(B, NB*D, D)[:, :R]
    def per_chain(ck, nhat):
        pt = jax.random.permutation(ck[1], R - 1) + 1
        perm = jnp.concatenate([jnp.zeros((1,), pt.dtype), pt])
        return nhat[perm]
    out = jax.vmap(per_chain)(ks, nh)
    return out.sum()

def whiten(kk):
    dk, _ = _lane_keys(kk, B, None)
    ks = jax.vmap(lambda c: jax.random.split(c, 2))(dk)
    g = jax.vmap(lambda k2: jax.random.normal(k2[0], (NB, D, D)))(ks)
    nh = jnp.swapaxes(g, -1, -2).reshape(B, NB*D, D)[:, :R]
    wh = jnp.einsum("brd,bed->bre", nh, chol)
    norms = jnp.sqrt(jnp.sum(wh*wh, axis=2))
    return (wh / jnp.maximum(norms, 1e-30)[:, :, None]).sum() + norms.sum()

for name, fn in [("keysplit", keysplit), ("normals", normals),
                 ("normals+GS", gs), ("normals+cholQR2", cholqr2),
                 ("normals+perm/gather", perm_gather),
                 ("normals+whiten", whiten)]:
    try:
        dt = timeit_chain(fn)
        print(f"{name:22s} {dt*1e3:8.2f} ms/epoch", flush=True)
    except Exception as e:
        print(f"{name:22s} FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)
