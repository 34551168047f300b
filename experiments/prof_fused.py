import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, math, functools
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops import slice_kernel as sk

D, B, R = 20, 8192, 100
like = get_likelihood("gaussian", D)
calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
cfg = sk.EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,), num_repeats=(R,))

key = jax.random.PRNGKey(0)
seeds = 0.5 + 0.1*jax.random.normal(key, (B, D))
r0 = 0.1*math.sqrt(D)*1.5
bound = -0.5*(r0/0.1)**2 - D*(math.log(0.1)+0.5*math.log(2*math.pi))
bounds = jnp.full((B,), bound, jnp.float32)
chol = jnp.broadcast_to(0.1*jnp.eye(D, dtype=jnp.float32), (B, D, D))
valid = jnp.ones((B,), bool)
args = jax.block_until_ready(jax.device_put((seeds, bounds, chol, valid)))
keys = [jax.block_until_ready(jax.device_put(jax.random.PRNGKey(r))) for r in range(8)]

def timeit(name, fn):
    n0 = int(np.asarray(fn(keys[0], *args)).sum())   # compile+warm, forced fetch
    ts, ns = [], []
    for r in range(3):
        t0 = time.perf_counter()
        n = int(np.asarray(fn(keys[r+1], *args)).sum())
        ts.append(time.perf_counter()-t0); ns.append(n)
    rate = ns[ts.index(min(ts))]/min(ts)
    print(f"{name:30s} min={min(ts)*1e3:9.1f}ms  evals/s={rate:12.0f}  all={[round(t*1e3,1) for t in ts]}", flush=True)

# variant: full fused engine, nlike only out
raw = sk.build_epoch_fn(calc, cfg)
@jax.jit
def fused_full(key, s, b, c, v):
    return raw(key, s, b, c, v)[:, -1:].astype(jnp.int32).sum(0)
timeit("fused full", fused_full)

# scan engine
raws = sk.build_epoch_fn_scan(calc, cfg)
@jax.jit
def scan_full(key, s, b, c, v):
    return raws(key, s, b, c, v)[:, -1:].astype(jnp.int32).sum(0)
timeit("scan full", scan_full)
