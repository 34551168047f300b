"""Body-iteration count of the v4 sliding-window kernel on chip vs the
sim_sliding_window.py prediction (5300 micros over 8 chunks at W=8)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math, time
import jax, jax.numpy as jnp, numpy as np
from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig
from v4_instr import build_epoch_fn_pallas_v4 as build_instr, UNROLL

B, D, R = 8192, 20, 100

like = get_likelihood("gaussian", D)
calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,),
                  num_repeats=(R,), engine="pallas")
key = jax.random.PRNGKey(0)
seeds = 0.5 + 0.1 * jax.random.normal(key, (B, D))
r0 = 0.1 * math.sqrt(D) * 1.5
bound = -0.5 * (r0 / 0.1) ** 2 - D * (math.log(0.1) + 0.5 * math.log(2 * math.pi))
bounds = jnp.full((B,), bound, jnp.float32)
chol = jnp.broadcast_to(0.1 * jnp.eye(D, dtype=jnp.float32), (B, D, D))
valid = jnp.ones((B,), bool)

raw = build_instr(calc, cfg)

@jax.jit
def f(k, s, b, c, v):
    packed = raw(k, s, b, c, v)
    nlike = packed[:, -2:-1].astype(jnp.int32).sum()
    return nlike, raw.dbg_iters[::8, 0]  # one row per chunk

n, it = f(key, *jax.device_put((seeds, bounds, chol, valid)))
n, it = int(np.asarray(n)), np.asarray(it)
bodies = it.sum()
print(f"evals={n}  bodies per chunk={it.astype(int).tolist()}")
print(f"total bodies={bodies:.0f} micros={bodies*UNROLL:.0f} "
      f"(sim predicted ~1325 bodies / 5300 micros)")
# chained timing for per-body cost (amortise tunnel)
@jax.jit
def g(k, s, b, c, v):
    def step(carry, i):
        kk = jax.random.fold_in(k, i)
        packed = raw(kk, s, b, c, v)
        return carry + packed[:, -2:-1].astype(jnp.int32).sum(), None
    tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.int32), jnp.arange(8))
    return tot
args = jax.device_put((seeds, bounds, chol, valid))
int(np.asarray(g(key, *args)))
ts = []
for _ in range(3):
    t0 = time.perf_counter(); int(np.asarray(g(key, *args))); ts.append(time.perf_counter()-t0)
t1s = []
@jax.jit
def g1(k, s, b, c, v):
    packed = raw(k, s, b, c, v)
    return packed[:, -2:-1].astype(jnp.int32).sum()
int(np.asarray(g1(key, *args)))
for _ in range(3):
    t0 = time.perf_counter(); int(np.asarray(g1(key, *args))); t1s.append(time.perf_counter()-t0)
dev = (min(ts) - min(t1s)) / 7.0
print(f"device {dev*1e3:.2f} ms/epoch -> {dev/ (bodies*UNROLL)*1e6:.2f} us/micro "
      f"({n/dev/1e6:.0f}M evals/s)")
