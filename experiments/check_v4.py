"""v4 vs v3 bitwise check (interpret mode on CPU; compiled on TPU).

The v4 kernel must reproduce v3's packed epoch output exactly: same murmur3
uniform streams keyed on (key, lane, repeat, it), same direction streams,
same f32 fma order for x0.  Run on CPU: JAX_PLATFORMS=cpu python check_v4.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math

import jax
import jax.numpy as jnp
import numpy as np

from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig
from polychordlite_tpu.ops.pallas_slice_v3 import build_epoch_fn_pallas_v3
from polychordlite_tpu.ops.pallas_slice_v4 import build_epoch_fn_pallas_v4

B, D, R = 2048, 6, 13  # small + odd R, 2 chunks


def main():
    like = get_likelihood("gaussian", D)
    calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
    cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,),
                      num_repeats=(R,), engine="pallas")

    key = jax.random.PRNGKey(7)
    seeds = 0.5 + 0.05 * jax.random.normal(key, (B, D))
    r0 = 0.1 * math.sqrt(D) * 1.8
    bound = -0.5 * (r0 / 0.1) ** 2 - D * (math.log(0.1) + 0.5 * math.log(2 * math.pi))
    bounds = jnp.full((B,), bound, jnp.float32)
    chol = jnp.broadcast_to(0.1 * jnp.eye(D, dtype=jnp.float32), (B, D, D))
    valid = jnp.ones((B,), bool).at[-130:].set(False)  # exercise invalid lanes

    e3 = jax.jit(build_epoch_fn_pallas_v3(calc, cfg))
    e4 = jax.jit(build_epoch_fn_pallas_v4(calc, cfg))
    p3 = np.asarray(e3(key, seeds, bounds, chol, valid))
    p4 = np.asarray(e4(key, seeds, bounds, chol, valid))
    same = np.array_equal(p3, p4)
    print("bitwise equal:", same)
    if not same:
        diff = np.abs(p3 - p4)
        bad = np.argwhere(diff > 0)
        print("num mismatch:", len(bad), "max", diff.max())
        print("first rows:", bad[:10])
        ncols = p3.shape[1]
        stride = 2 * D + calc.n_phi + 1
        print("stride", stride, "ncols", ncols)
        for b, c in bad[:10]:
            print(int(b), int(c), "rep", c // stride, "off", c % stride,
                  p3[b, c], p4[b, c])
    assert same


if __name__ == "__main__":
    main()
