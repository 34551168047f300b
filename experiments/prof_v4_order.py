"""Chunk-0 anomaly: execution order or data?

(a) isolation: run each 1024-lane chunk's data as its own B=1024 call.
(b) full batch for reference.
If isolated counts are all ~150, the anomaly is an order/interaction
artifact of the multi-chunk grid; if chunk 0's data alone is slow, it's
data-driven.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig
import v4_instr

B, D, R = 8192, 20, 100
like = get_likelihood("gaussian", D)
calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,),
                  num_repeats=(R,), engine="pallas")
key = jax.random.PRNGKey(0)
seeds = 0.5 + 0.1 * jax.random.normal(key, (B, D))
r0 = 0.1 * math.sqrt(D) * 1.5
bound = -0.5*(r0/0.1)**2 - D*(math.log(0.1)+0.5*math.log(2*math.pi))
bounds = jnp.full((B,), bound, jnp.float32)
chol = jnp.broadcast_to(0.1*jnp.eye(D, dtype=jnp.float32), (B, D, D))
valid = jnp.ones((B,), bool)

raw = v4_instr.build_epoch_fn_pallas_v4(calc, cfg)

@jax.jit
def f(k, s, b, c, v):
    packed = raw(k, s, b, c, v)
    return packed[:, -2:-1].astype(jnp.int32).sum(), raw.dbg_iters[::8, 0]

n, it = f(key, seeds, bounds, chol, valid)
print("full:", int(np.asarray(n)), np.asarray(it).astype(int).tolist(),
      flush=True)

# isolation: each chunk as its own B=1024 batch.  NOTE: per-lane RNG keys
# depend on global lane index, so chunk c in isolation gets lane ids
# 0..1023 (different streams from the full batch) — the comparison is
# statistical, which is all we need.
@jax.jit
def f1(k, s, b, c, v):
    packed = raw(k, s, b, c, v)
    return packed[:, -2:-1].astype(jnp.int32).sum(), raw.dbg_iters[:1, 0]

for c in range(8):
    sl = slice(c * 1024, (c + 1) * 1024)
    n, it = f1(key, seeds[sl], bounds[sl], chol[sl], valid[sl])
    print(f"iso chunk {c}:", int(np.asarray(n)),
          np.asarray(it).astype(int).tolist(), flush=True)
