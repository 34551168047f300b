"""Isolate the ~409 us/grid-step skeleton overhead of the v3 kernel.

prof_v3_iters.py shows: cheap body (1 while-iter/step) => 40.9 ms over
grid=(100,), i.e. ~409 us/step of pure structural cost.  Variants here add
the v3 kernel's structural elements one at a time to a trivial grid kernel:

  A. grid=(100,), one (1,D,S,128) streamed input, copy to (1,S,128) output
  B. A + while loop (1 iter) in body
  C. B + rc-1 constant-index head inputs (3, D, S, 128)
  D. C + full v3 scratch set (ring + state refs)
  E. D + constant-index x0 input (D,S,128)
  F. B with dimension_semantics parallel (no scratch)  [sanity]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, S, LANE, R = 20, 64, 128, 100


def timeit(fn, *args):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def build(variant):
    use_while = variant in "BCDEF"
    use_head = variant in "CDE"
    use_scratch = variant in "DE"
    use_x0 = variant == "E"
    sem = "parallel" if variant == "F" else "arbitrary"

    def kernel(stream_ref, *rest):
        i = 0
        rest = list(rest)
        head_ref = rest.pop(0) if use_head else None
        x0_ref = rest.pop(0) if use_x0 else None
        out_ref = rest.pop(0)
        scratch = rest

        val = stream_ref[0, 0] * 1.0
        if use_head:
            val = val + head_ref[0, 0]
        if use_x0:
            val = val + x0_ref[:, :][0]
        if use_while:
            def body(c):
                return (c[0] + 1, c[1] + 1.0)
            def cond(c):
                return c[0] < 1
            _, v = jax.lax.while_loop(
                cond, body, (jnp.zeros((), jnp.int32), val))
            val = v
        if use_scratch and sem == "arbitrary":
            r = pl.program_id(0)
            @pl.when(r == 0)
            def _():
                for s in scratch:
                    s[...] = jnp.zeros_like(s)
            scratch[0][...] = scratch[0][...] + val[None]
        out_ref[...] = val[None]

    in_specs = [pl.BlockSpec((1, D, S, LANE), lambda r: (r, 0, 0, 0))]
    inputs = [jnp.ones((R, D, S, LANE), jnp.float32)]
    if use_head:
        in_specs.append(pl.BlockSpec((3, D, S, LANE), lambda r: (0, 0, 0, 0)))
        inputs.append(jnp.ones((3, D, S, LANE), jnp.float32))
    if use_x0:
        in_specs.append(pl.BlockSpec((D, S, LANE), lambda r: (0, 0, 0)))
        inputs.append(jnp.ones((D, S, LANE), jnp.float32))

    scratch_shapes = []
    if use_scratch:
        scratch_shapes = [
            pltpu.VMEM((4, D, S, LANE), jnp.float32),
            pltpu.VMEM((D, S, LANE), jnp.float32),
            pltpu.VMEM((D, S, LANE), jnp.float32),
        ] + [pltpu.VMEM((S, LANE), jnp.float32) for _ in range(12)]

    fn = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S, LANE), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, S, LANE), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    )
    jfn = jax.jit(lambda *a: fn(*a).sum())
    t = timeit(jfn, *inputs)
    print(f"{variant}: {t*1e3:8.2f} ms  ({t/R*1e6:7.1f} us/step)", flush=True)


for v in "ABCDEF":
    try:
        build(v)
    except Exception as e:
        print(f"{v}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
