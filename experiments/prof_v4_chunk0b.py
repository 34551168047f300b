"""Chunk-0 anomaly: TPU vs interpret body counts at identical small shape."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig
import v4_instr

B, D, R = 4096, 20, 25  # 4 chunks
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
args = (seeds, bounds, chol, valid)

for mode in ("tpu", "interp"):
    raw = v4_instr.build_epoch_fn_pallas_v4(
        calc, cfg, interpret=(mode == "interp"))

    @jax.jit
    def f(k, s, b, c, v):
        packed = raw(k, s, b, c, v)
        return packed[:, -2:-1].astype(jnp.int32).sum(), raw.dbg_iters[::8, 0]

    n, it = f(key, *args)
    print(mode, int(np.asarray(n)), np.asarray(it).astype(int).tolist(),
          flush=True)
