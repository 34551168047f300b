"""Isolate while-carry memory-op costs at B=8192: DUS into a big carried
buffer, per-lane gather from a table, pass-through of a big buffer."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

B, T, C, R, D = 8192, 1201, 21, 100, 20
N = 400  # iterations

def timed(name, fn, *args):
    r = fn(*args); float(np.asarray(r).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        ts.append(time.perf_counter()-t0)
    print(f"{name:42s} min={min(ts)*1e3:9.1f}ms -> {min(ts)/N*1e6:8.1f}us/iter", flush=True)

@jax.jit
def loop_dus(x):
    ring = jnp.zeros((B, T, C), jnp.float32)
    def body(c):
        i, ring, x = c
        entry = (x + i)[:, None, :C]
        ring = jax.lax.dynamic_update_slice(ring, entry, (0, i % T, 0))
        return (i+1, ring, x)
    _, ring, _ = jax.lax.while_loop(lambda c: c[0] < N, body, (jnp.zeros((), jnp.int32), ring, x))
    return ring[0, 0, 0]

@jax.jit
def loop_gather(x, table):
    def body(c):
        i, acc, x = c
        idx = (acc.astype(jnp.int32) + i) % R
        row = jnp.take_along_axis(table, idx[:, None, None], axis=1)[:, 0]
        return (i+1, acc + row[:, 0], x)
    _, acc, _ = jax.lax.while_loop(lambda c: c[0] < N, body, (jnp.zeros((), jnp.int32), jnp.zeros((B,)), x))
    return acc[0]

@jax.jit
def loop_pass(x):
    big = jnp.zeros((B, T, C), jnp.float32)
    def body(c):
        i, big, s = c
        return (i+1, big, s + 1.0)
    _, big, s = jax.lax.while_loop(lambda c: c[0] < N, body, (jnp.zeros((), jnp.int32), big, jnp.zeros((B,))))
    return s[0] + big[0,0,0]

@jax.jit
def loop_dus_rep(x):
    # DUS into a small (B, R) int table at a per-iteration scalar slot
    tab = jnp.zeros((B, T), jnp.int32)
    def body(c):
        i, tab, x = c
        v = (x[:, 0] + i).astype(jnp.int32)
        tab = jax.lax.dynamic_update_slice(tab, v[:, None], (0, i % T))
        return (i+1, tab, x)
    _, tab, _ = jax.lax.while_loop(lambda c: c[0] < N, body, (jnp.zeros((), jnp.int32), tab, x))
    return tab[0, 0]

key = jax.random.PRNGKey(0)
x = jax.block_until_ready(jax.device_put(jax.random.normal(key, (B, D+C))))
table = jax.block_until_ready(jax.device_put(jax.random.normal(key, (B, R, D))))
timed("pass-through big (B,T,21) carry", loop_pass, x)
timed("DUS (B,1,21) into (B,T,21) carry", loop_dus, x)
timed("DUS (B,1) into (B,T) int carry", loop_dus_rep, x)
timed("take_along_axis (B,) rows of (B,R,D)", loop_gather, x, table)
