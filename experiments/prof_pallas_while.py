"""Per-iteration cost of a Mosaic while loop: empty body vs any()-cond vs
counter cond vs prng body, at (8,128) and (64,128) lane tiles."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 50000  # iterations


def make_kernel(sub, lane, variant):
    def kernel(x_ref, o_ref):
        x = x_ref[:, :]

        if variant == "counter":
            def body(c):
                i, acc = c
                return (i + 1, acc + 1.0)
            def cond(c):
                return c[0] < N
            _, acc = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), x))
        elif variant == "anycond":
            def body(c):
                i, acc = c
                return (i + 1, acc + 1.0)
            def cond(c):
                i, acc = c
                return (i < N) & jnp.any(acc > -1e30)
            _, acc = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), x))
        elif variant == "prng":
            pltpu.prng_seed(7)
            def body(c):
                i, acc = c
                bits = pltpu.bitcast(pltpu.prng_random_bits((sub, lane)), jnp.int32)
                u = (bits & 0x00FFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
                return (i + 1, acc + u)
            def cond(c):
                return c[0] < N
            _, acc = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), x))
        elif variant == "body20":
            # ~a slice-iteration's worth of vector work on (20, sub, lane)
            big = jnp.broadcast_to(x[None], (20, sub, lane))
            def body(c):
                i, acc, b = c
                probe = b + 0.001 * acc[None]
                d = (probe - 0.5) * 10.0
                logL = -0.5 * jnp.sum(d * d, axis=0)
                inside = logL > -40.0
                acc = jnp.where(inside, acc + 1.0, acc * 0.5)
                return (i + 1, acc, b)
            def cond(c):
                return c[0] < N
            _, acc, _ = jax.lax.while_loop(
                cond, body, (jnp.zeros((), jnp.int32), x, big)
            )
        o_ref[:, :] = acc

    return kernel


def run(sub, lane, variant):
    x = jnp.zeros((sub, lane), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            make_kernel(sub, lane, variant),
            out_shape=jax.ShapeDtypeStruct((sub, lane), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    )
    float(np.asarray(fn(x)).sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(x)).sum())
        ts.append(time.perf_counter() - t0)
    print(
        f"{variant:9s} ({sub:3d},{lane}) min={min(ts)*1e3:8.1f}ms "
        f"-> {min(ts)/N*1e6:7.2f}us/iter",
        flush=True,
    )


for sub, lane in ((64, 128),):
    for v in ("counter", "anycond", "prng", "body20"):
        try:
            run(sub, lane, v)
        except Exception as e:
            print(f"{v} ({sub},{lane}) FAILED: {repr(e)[:150]}", flush=True)
