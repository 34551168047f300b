"""Prototype v3: slice-sampling repeat in pallas with (D, 8, 128) layout.

Chains live on full native (8,128) vreg tiles (8*128 = 1024 chains per
block); coordinates sit on the leading (non-minor) axis, so broadcasts are
plain per-tile loops and reductions are tile accumulations — no lane or
sublane broadcasts."""
import functools, math, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 20
SUB, LANE = 8, 128
CHAINS_PER_BLOCK = SUB * LANE  # 1024
MAX_STEP = 200
MAX_SHRINK = 100
MAX_INNER = 2 * MAX_STEP + MAX_SHRINK + 4
LOGZERO = -1e30
PH_INIT_R, PH_INIT_L, PH_STEP_R, PH_STEP_L, PH_SHRINK, PH_DONE = range(6)

SIGMA = 0.1
NORM = -D * (math.log(SIGMA) + 0.5 * math.log(2 * math.pi))


def loglike_tiles(cube):  # (D, 8, 128) -> (8, 128)
    ok = jnp.min(jnp.where((cube >= 0.0) & (cube <= 1.0), 1.0, 0.0), axis=0)
    d = (jnp.clip(cube, 0.0, 1.0) - 0.5) / SIGMA
    logL = NORM - 0.5 * jnp.sum(d * d, axis=0)
    return jnp.where(ok > 0.5, logL, LOGZERO)


def repeat_kernel(seed_ref, x0_ref, nhat_ref, w_ref, bound_ref,
                  out_cube_ref, out_logL_ref, nlike_ref):
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * 7919)

    x0 = x0_ref[:, :, :]     # (D, 8, 128)
    nhat = nhat_ref[:, :, :]
    w = w_ref[:, :]          # (8, 128)
    bound = bound_ref[:, :]

    def rand_u():
        bits = pltpu.bitcast(pltpu.prng_random_bits((SUB, LANE)), jnp.int32)
        # mask to 24 positive bits (int32-safe), scale to [0,1)
        return (bits & 0x00FFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))

    u0 = rand_u()
    tL0 = -u0 * w
    tR0 = (1.0 - u0) * w
    i32 = lambda v=0: jnp.full((SUB, LANE), v, jnp.int32)

    def body(st):
        (it, tL, tR, rstep, lstep, nshrink, need_r, need_l, phase,
         acc_cube, acc_logL, nlike) = st
        u = rand_u()
        t = jnp.where(phase == PH_INIT_R, tR, 0.0)
        t = jnp.where(phase == PH_INIT_L, tL, t)
        t = jnp.where(phase == PH_STEP_R, w * rstep.astype(jnp.float32), t)
        t = jnp.where(phase == PH_STEP_L, -w * lstep.astype(jnp.float32), t)
        t = jnp.where(phase == PH_SHRINK, tL + u * (tR - tL), t)

        probe = x0 + t[None, :, :] * nhat   # leading-dim broadcast
        logL = loglike_tiles(probe)         # (8, 128)

        inside = (logL >= bound) & (logL > LOGZERO)
        counted = (phase != PH_DONE) & (logL > LOGZERO)
        nlike = nlike + counted.astype(jnp.int32)

        is_ir = phase == PH_INIT_R
        is_il = phase == PH_INIT_L
        is_sr = phase == PH_STEP_R
        is_sl = phase == PH_STEP_L
        is_sh = phase == PH_SHRINK

        need_r = jnp.where(is_ir, inside.astype(jnp.int32), need_r)
        need_l = jnp.where(is_il, inside.astype(jnp.int32), need_l)
        after_il = jnp.where(need_r != 0, PH_STEP_R,
                             jnp.where(need_l != 0, PH_STEP_L, PH_SHRINK))

        done_r = is_sr & (~inside | (rstep >= MAX_STEP))
        done_l = is_sl & (~inside | (lstep >= MAX_STEP))
        tR = jnp.where(done_r, t, tR)
        tL = jnp.where(done_l, t, tL)
        rstep = jnp.where(is_sr & ~done_r, rstep + 1, rstep)
        lstep = jnp.where(is_sl & ~done_l, lstep + 1, lstep)

        accept = is_sh & inside
        forced = is_sh & ~inside & (nshrink + 1 >= MAX_SHRINK)
        acc = accept | forced
        contract = is_sh & ~inside & ~forced
        tR = jnp.where(contract & (t > 0.0), t, tR)
        tL = jnp.where(contract & (t <= 0.0), t, tL)
        nshrink = jnp.where(contract | forced, nshrink + 1, nshrink)

        accf = jnp.where(acc, 1.0, 0.0)
        acc_cube = probe * accf[None, :, :] + acc_cube * (1.0 - accf)[None, :, :]
        acc_logL = jnp.where(acc, jnp.where(forced, LOGZERO, logL), acc_logL)

        phase = jnp.where(is_ir, PH_INIT_L, phase)
        phase = jnp.where(is_il, after_il, phase)
        phase = jnp.where(done_r, jnp.where(need_l != 0, PH_STEP_L, PH_SHRINK), phase)
        phase = jnp.where(done_l, PH_SHRINK, phase)
        phase = jnp.where(acc, PH_DONE, phase)
        return (it + 1, tL, tR, rstep, lstep, nshrink, need_r, need_l, phase,
                acc_cube, acc_logL, nlike)

    init = (jnp.zeros((), jnp.int32), tL0, tR0,
            i32(1), i32(1), i32(0), i32(0), i32(0), i32(PH_INIT_R),
            x0, jnp.full((SUB, LANE), LOGZERO, jnp.float32), i32(0))

    def cond(st):
        return (st[0] < MAX_INNER) & jnp.any(st[8] != PH_DONE)

    st = jax.lax.while_loop(cond, body, init)
    out_cube_ref[:, :, :] = st[9]
    out_logL_ref[:, :] = st[10]
    nlike_ref[:, :] = st[11]


@functools.partial(jax.jit, static_argnames=("n_blocks",))
def run_repeat(seed, x0, nhat, w, bound, n_blocks):
    # shapes: x0 (D, 8*n_blocks, 128), w (8*n_blocks, 128)
    return pl.pallas_call(
        repeat_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((D, SUB, LANE), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((D, SUB, LANE), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((SUB, LANE), lambda i, *_: (i, 0)),
                pl.BlockSpec((SUB, LANE), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((D, SUB, LANE), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((SUB, LANE), lambda i, *_: (i, 0)),
                pl.BlockSpec((SUB, LANE), lambda i, *_: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((D, SUB * n_blocks, LANE), jnp.float32),
            jax.ShapeDtypeStruct((SUB * n_blocks, LANE), jnp.float32),
            jax.ShapeDtypeStruct((SUB * n_blocks, LANE), jnp.int32),
        ],
    )(seed, x0, nhat, w, bound)


if __name__ == "__main__":
    n_blocks = 2               # B = 2048 chains
    B = CHAINS_PER_BLOCK * n_blocks
    key = jax.random.PRNGKey(0)
    x0 = 0.5 + 0.02 * jax.random.normal(key, (D, SUB * n_blocks, LANE))
    nh = jax.random.normal(jax.random.fold_in(key, 1), (D, SUB * n_blocks, LANE))
    nh = nh / jnp.linalg.norm(nh, axis=0, keepdims=True)
    w = jnp.full((SUB * n_blocks, LANE), 3 * SIGMA)
    r0 = SIGMA * math.sqrt(D) * 1.5
    bound = jnp.full((SUB * n_blocks, LANE), NORM - 0.5 * (r0 / SIGMA) ** 2)
    seed = jnp.array([1234], dtype=jnp.int32)

    t0 = time.perf_counter()
    cube, logL, nlike = run_repeat(seed, x0, nh, w, bound, n_blocks)
    n = int(np.asarray(nlike).sum())
    print("compile+first:", round(time.perf_counter() - t0, 1), "s; evals:", n, flush=True)

    R = 100
    @functools.partial(jax.jit, static_argnames=())
    def chain(seed0, xs):
        def step(carry, r):
            xs, tot = carry
            cube, logL, nlike = run_repeat(seed0 + r, xs, nh, w, bound, n_blocks)
            return (cube, tot + nlike.sum()), logL
        (xs_f, tot), logLs = jax.lax.scan(step, (xs, jnp.zeros((), jnp.int32)), jnp.arange(R))
        return xs_f, tot, logLs[-1]
    xs_f, tot, logL = chain(seed, x0)
    tot_v = int(np.asarray(tot))  # forces completion
    t0 = time.perf_counter()
    xs_f, tot, logL = chain(seed + 1, x0)
    tot_v = int(np.asarray(tot))
    dt = time.perf_counter() - t0
    print(f"{R} in-jit repeats: {dt:.3f}s {tot_v} evals -> {tot_v/dt:,.0f} evals/s (B={B})")
    ok = np.asarray(logL) >= np.asarray(bound) - 1e-4
    print("accepted in-bound frac:", ok.mean())

# ---------------------------------------------------------------------------
# Round-1 verdict (2026-08-17, v5e-lite via axon): this fused kernel compiles
# and is correct (100% in-bound accepts) but reaches only ~4.3M evals/s at
# B=2048 vs ~15-21M evals/s for the XLA scan-over-repeats engine in
# polychordlite_tpu/ops/slice_kernel.py — Mosaic while-loop overhead and
# per-block serial grid dominate.  Kept for round-2 tuning (ideas: fuse the
# whole R-repeat chain per kernel invocation, move the scan inside, wider
# blocks, double-buffered HBM streaming of nhats).
# Mosaic recipes that made it compile on this build: (D, 8, 128) layout with
# coordinates on the leading axis; int32 masks (no i1 carries); int32 PRNG
# bit masking (no uint32 casts); explicit leading-dim broadcasts only.
# ---------------------------------------------------------------------------
