"""v5 vs v4 equivalence check (interpret mode on CPU; compiled on TPU).

The v5 speculative-packet kernel must replay v4's sequential machine
*decision-exactly*: identical accepted positions (cube columns bitwise),
identical per-repeat eval counts (nlike bitwise), identical uniform
consumption.  The stored logL is the same likelihood evaluated on the same
probe in a different XLA graph, where fma-contraction / reduction-order
choices may differ by ~1 ulp — so logL columns are compared to 4 ulp, not
bitwise (cube+nlike bitwise equality proves no decision diverged).

Run on CPU: JAX_PLATFORMS=cpu python check_v5.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math

import jax
import jax.numpy as jnp
import numpy as np

from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig
from polychordlite_tpu.ops.pallas_slice_v4 import build_epoch_fn_pallas_v4
from polychordlite_tpu.ops.pallas_slice_v5 import build_epoch_fn_pallas_v5


def compare(name, cfg, calc, key, seeds, bounds, chol, valid):
    D, R = cfg.n_dims, cfg.total_repeats
    stride = 2 * D + calc.n_phi + 1
    p4 = np.asarray(
        jax.jit(build_epoch_fn_pallas_v4(calc, cfg))(key, seeds, bounds, chol, valid)
    )
    p5 = np.asarray(
        jax.jit(build_epoch_fn_pallas_v5(calc, cfg))(key, seeds, bounds, chol, valid)
    )
    B = p4.shape[0]
    rec4 = p4[:, : R * stride].reshape(B, R, stride)
    rec5 = p5[:, : R * stride].reshape(B, R, stride)
    cube_ok = np.array_equal(rec4[:, :, : 2 * D + calc.n_phi],
                             rec5[:, :, : 2 * D + calc.n_phi])
    tail_ok = np.array_equal(p4[:, R * stride:], p5[:, R * stride:])  # nlike
    # logL: same likelihood on the same probe in a different XLA graph —
    # ulp drift of the in-kernel chain position, amplified by the
    # likelihood's Lipschitz constant
    L4, L5 = rec4[:, :, -1].astype(np.float64), rec5[:, :, -1].astype(np.float64)
    dmax = float(np.abs(L4 - L5).max())
    logL_ok = np.allclose(L4, L5, rtol=1e-5, atol=1e-3)
    ok = cube_ok and tail_ok and logL_ok
    print(f"{name}: cube/theta/phi bitwise={cube_ok} nlike bitwise={tail_ok} "
          f"logL max |diff|={dmax:.2e} -> {'OK' if ok else 'FAIL'}")
    return ok


def run_case(name, D, R, max_step, max_shrink, chol_scale, bound_off, B=1024):
    like = get_likelihood("gaussian", D)
    calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
    cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,),
                      num_repeats=(R,), engine="pallas",
                      max_step=max_step, max_shrink=max_shrink)
    key = jax.random.PRNGKey(11)
    seeds = 0.5 + 0.05 * jax.random.normal(key, (B, D))
    r0 = 0.1 * math.sqrt(D) * 1.8
    bound = (-0.5 * (r0 / 0.1) ** 2
             - D * (math.log(0.1) + 0.5 * math.log(2 * math.pi)) + bound_off)
    bounds = jnp.full((B,), bound, jnp.float32)
    chol = jnp.broadcast_to(
        chol_scale * jnp.eye(D, dtype=jnp.float32), (B, D, D)
    )
    valid = jnp.ones((B,), bool).at[-130:].set(False)
    return compare(name, cfg, calc, key, seeds, bounds, chol, valid)


def main():
    ok = True
    ok &= run_case("baseline D=6 R=13", 6, 13, 100, 100, 0.1, 0.0, B=2048)
    ok &= run_case("step-out heavy max_step=3", 6, 5, 3, 100, 0.002, 0.0)
    ok &= run_case("max_step=1", 6, 5, 1, 100, 0.02, 0.0)
    ok &= run_case("forced shrink max_shrink=2", 6, 7, 100, 2, 0.5, 5.0)
    ok &= run_case("forced shrink max_shrink=5", 6, 7, 100, 5, 0.3, 10.0)
    ok &= run_case("R=1", 4, 1, 100, 100, 0.1, 0.0)
    ok &= run_case("R=2", 4, 2, 100, 100, 0.1, 0.0)
    ok &= run_case("impossible bound", 4, 3, 100, 100, 0.1, 1e8)
    ok &= run_case("D=20 R=23", 20, 23, 100, 100, 0.02, 0.0, B=2048)
    ok &= run_case("multi-chunk B=4096 D=20 R=9", 20, 9, 100, 100, 0.02, 0.0,
                   B=4096)
    print("ALL OK" if ok else "FAILURES")
    assert ok


if __name__ == "__main__":
    main()
