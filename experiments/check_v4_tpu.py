"""Small-problem v4 smoke on the real TPU: resident-out path, then DMA-out
path, each vs the v3 kernel's output (bitwise)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math, time
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig
from polychordlite_tpu.ops.pallas_slice_v3 import build_epoch_fn_pallas_v3
from polychordlite_tpu.ops.pallas_slice_v4 import build_epoch_fn_pallas_v4

CASES = [("res_out", 1024, 6, 12), ("dma_out", 8192, 20, 30)]
for name, B, D, R in CASES:
    like = get_likelihood("gaussian", D)
    calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
    cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,),
                      num_repeats=(R,), engine="pallas")
    key = jax.random.PRNGKey(1)
    r0 = 0.1 * math.sqrt(D) * 1.5
    sr = 0.1 * jax.random.normal(key, (B, D))
    r = jnp.sqrt((sr**2).sum(axis=1, keepdims=True))
    seeds = 0.5 + sr * jnp.minimum(1.0, 0.9 * r0 / r)
    bound = -0.5*(r0/0.1)**2 - D*(math.log(0.1)+0.5*math.log(2*math.pi))
    bounds = jnp.full((B,), bound, jnp.float32)
    chol = jnp.broadcast_to(0.1*jnp.eye(D, dtype=jnp.float32), (B, D, D))
    valid = jnp.ones((B,), bool).at[-3:].set(False)
    args = jax.block_until_ready(jax.device_put((seeds, bounds, chol, valid)))

    t0 = time.time()
    e4 = jax.jit(build_epoch_fn_pallas_v4(calc, cfg))
    p4 = np.asarray(e4(key, *args))
    print(f"{name}: v4 ran in {time.time()-t0:.1f}s sum={p4.sum():.3f}",
          flush=True)
    e3 = jax.jit(build_epoch_fn_pallas_v3(calc, cfg))
    p3 = np.asarray(e3(key, *args))
    print(f"{name}: bitwise equal to v3: {np.array_equal(p3, p4)}", flush=True)
