"""Marginal while-iteration cost of the fused-loop body pieces at B=8192:
run the same loop with a forced iteration floor N and fit time(N)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, math
import jax, jax.numpy as jnp, numpy as np

B, D = 8192, 20
key = jax.random.PRNGKey(0)
lane_ids = jnp.arange(B)


def timed(fn, *args, reps=3):
    int(np.asarray(fn(*args)).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(np.asarray(fn(*args)).sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def loop(body_fn, n_iters):
    @jax.jit
    def run(key):
        loop_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(lane_ids)

        def body(c):
            i, acc = c
            return (i + 1, body_fn(loop_keys, i, acc))

        _, acc = jax.lax.while_loop(
            lambda c: c[0] < n_iters, body, (jnp.zeros((), jnp.int32), jnp.zeros((B,)))
        )
        return acc

    return run


def empty(loop_keys, i, acc):
    return acc + 1.0


def one_hash(loop_keys, i, acc):
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(
        jax.vmap(lambda k: jax.random.fold_in(k, i))(loop_keys)
    )
    return acc + u


def draw3(loop_keys, i, acc):  # the fused engine's draw(): 3 hashes
    rep = (acc.astype(jnp.int32)) % 7
    u = jax.vmap(
        lambda k, r: jax.random.uniform(
            jax.random.fold_in(jax.random.fold_in(k, r), i), ()
        )
    )(loop_keys, rep)
    return acc + u


def raw_threefry(loop_keys, i, acc):  # one threefry_2x32 per iteration
    from jax._src.prng import threefry_2x32

    rep = acc.astype(jnp.uint32) % 7
    kp = (jnp.zeros((B,), jnp.uint32), jnp.ones((B,), jnp.uint32))
    bits = threefry_2x32(
        jnp.stack([kp[0][0], kp[1][0]]),
        jnp.stack([lane_ids.astype(jnp.uint32), rep + jnp.uint32(i)]).reshape(-1),
    )
    u = (bits[:B] >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return acc + u


for name, body in [
    ("empty", empty),
    ("1 fold_in + uniform (2 hashes)", one_hash),
    ("fused draw (3 hashes)", draw3),
]:
    print("compiling", name, flush=True)
    t_lo = timed(loop(body, 100), key)
    print("  t100 done", round(t_lo*1e3,1), flush=True)
    t_hi = timed(loop(body, 800), key)
    marg = (t_hi - t_lo) / 700
    print(f"{name:34s} t100={t_lo*1e3:8.1f}ms t800={t_hi*1e3:8.1f}ms marginal={marg*1e6:8.2f}us/iter", flush=True)
