"""Ring (windowless) vs scan engine timing, several batch sizes, 20-D gaussian."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, math
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops import slice_kernel as sk

D, R = 20, 100
like = get_likelihood("gaussian", D)
calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)

def bench(B, engine):
    cfg = sk.EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,), num_repeats=(R,), engine=engine)
    raw = sk.build_epoch_fn(calc, cfg)
    @jax.jit
    def fn(key, s, b, c, v):
        p = raw(key, s, b, c, v)
        nlike = p[:, -2:-1].astype(jnp.int32).sum(0)
        ovf = (p[:, -1] != 0).any().astype(jnp.int32)
        return nlike, ovf
    key = jax.random.PRNGKey(0)
    seeds = 0.5 + 0.1*jax.random.normal(key, (B, D))
    r0 = 0.1*math.sqrt(D)*1.5
    bound = -0.5*(r0/0.1)**2 - D*(math.log(0.1)+0.5*math.log(2*math.pi))
    bounds = jnp.full((B,), bound, jnp.float32)
    chol = jnp.broadcast_to(0.1*jnp.eye(D, dtype=jnp.float32), (B, D, D))
    valid = jnp.ones((B,), bool)
    args = jax.block_until_ready(jax.device_put((seeds, bounds, chol, valid)))
    keys = [jax.block_until_ready(jax.device_put(jax.random.PRNGKey(r))) for r in range(6)]
    out = fn(keys[0], *args); n0 = int(np.asarray(out[0]).sum()); ov = int(np.asarray(out[1]))
    ts, ns = [], []
    for r in range(4):
        t0 = time.perf_counter()
        out = fn(keys[r+1], *args)
        n = int(np.asarray(out[0]).sum())
        ts.append(time.perf_counter()-t0); ns.append(n)
    best = ts.index(min(ts))
    print(f"{engine:5s} B={B:6d} min={min(ts)*1e3:9.1f}ms evals/s={ns[best]/min(ts):12.0f} ovf={ov} all={[round(t*1e3,1) for t in ts]}", flush=True)

for B in (8192, 32768):
    for eng in ("ring", "scan"):
        bench(B, eng)
bench(65536, "ring")
