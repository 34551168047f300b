"""Scan-engine per-iteration breakdown: full vs no-RNG vs no-likelihood."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, math
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops import slice_kernel as sk

D, B, R = 20, 8192, 100
like = get_likelihood("gaussian", D)
calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
cfg = sk.EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,), num_repeats=(R,), engine="scan")

key = jax.random.PRNGKey(0)
seeds = 0.5 + 0.1*jax.random.normal(key, (B, D))
r0 = 0.1*math.sqrt(D)*1.5
bound = -0.5*(r0/0.1)**2 - D*(math.log(0.1)+0.5*math.log(2*math.pi))
bounds = jnp.full((B,), bound, jnp.float32)
chol = jnp.broadcast_to(0.1*jnp.eye(D, dtype=jnp.float32), (B, D, D))
valid = jnp.ones((B,), bool)
args = jax.block_until_ready(jax.device_put((seeds, bounds, chol, valid)))
keys = [jax.block_until_ready(jax.device_put(jax.random.PRNGKey(r))) for r in range(6)]

def timeit(name, raw):
    @jax.jit
    def fn(key, s, b, c, v):
        p = raw(key, s, b, c, v)
        return p[:, -2:-1].astype(jnp.int32).sum(0)
    int(np.asarray(fn(keys[0], *args)).sum())
    ts, ns = [], []
    for r in range(4):
        t0 = time.perf_counter()
        n = int(np.asarray(fn(keys[r+1], *args)).sum())
        ts.append(time.perf_counter()-t0); ns.append(n)
    b = ts.index(min(ts))
    print(f"{name:26s} min={min(ts)*1e3:8.1f}ms evals/s={ns[b]/min(ts):12.0f}", flush=True)

timeit("scan full", sk.build_epoch_fn_scan(calc, cfg))

# monkeypatched variants
import polychordlite_tpu.ops.slice_kernel as mod
orig_uniform = jax.random.uniform
orig_foldin = jax.random.fold_in

# no-RNG inside loop: constant u (wrong results; perf only)
class FakeRandom:
    pass
def build_no_rng():
    import types
    real_vmap = jax.vmap
    def epoch_patch(*a, **k): pass
    # simplest: patch jax.random.uniform used in the loop via a flag
    return None

# variant via source-level knob: rebuild with calc that skips likelihood
null_calc = make_batched_calculator(lambda c: c, lambda th: 0.0*th[0], D, n_derived=2)
timeit("scan null-likelihood", sk.build_epoch_fn_scan(null_calc, cfg))
