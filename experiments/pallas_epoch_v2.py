"""Prototype v2: the WHOLE slice epoch in one pallas_call.

grid=(R,) over repeats (sequential on TPU); chain position x0 persists in
VMEM scratch across grid steps; per-repeat whitened directions stream in as
(1, D, S, L) blocks; accepted babies stream out as (1, D+1, S, L) blocks.
All 8192 lanes in one (64, 128) tile — measured Mosaic while cost is
~0.5us/iteration at this width (prof_pallas_while.py), ~20x below the XLA
scan engine's per-iteration cost.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 20
SUB, LANE = 64, 128
B = SUB * LANE  # 8192
R = 100
MAX_STEP = 200
MAX_SHRINK = 100
MAX_INNER = 2 * MAX_STEP + MAX_SHRINK + 4
LOGZERO = -1e30

SIGMA = 0.1
NORM = -D * (math.log(SIGMA) + 0.5 * math.log(2 * math.pi))

PH_INIT_R, PH_INIT_L, PH_STEP_R, PH_STEP_L, PH_SHRINK, PH_DONE = range(6)


def loglike_tile(cube):  # (D, S, L) -> (S, L)
    ok = jnp.min(jnp.where((cube >= 0.0) & (cube <= 1.0), 1.0, 0.0), axis=0)
    d = (cube - 0.5) / SIGMA
    logL = NORM - 0.5 * jnp.sum(d * d, axis=0)
    return jnp.where(ok > 0.5, logL, LOGZERO)


def epoch_kernel(seed_ref, x0_in_ref, bound_ref, nhat_ref, w_ref,
                 out_cube_ref, out_logL_ref, nlike_out_ref,
                 x0_ref, nlike_ref):
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + r)

    @pl.when(r == 0)
    def _init():
        x0_ref[:, :, :] = x0_in_ref[:, :, :]
        nlike_ref[:, :] = jnp.zeros((SUB, LANE), jnp.int32)

    x0 = x0_ref[:, :, :]
    nhat = nhat_ref[0, :, :, :]
    w = w_ref[0, :, :]
    bound = bound_ref[:, :]

    def rand_u():
        bits = pltpu.bitcast(pltpu.prng_random_bits((SUB, LANE)), jnp.int32)
        return (bits & 0x00FFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))

    i32 = lambda v=0: jnp.full((SUB, LANE), v, jnp.int32)
    f32 = lambda v=0.0: jnp.full((SUB, LANE), v, jnp.float32)

    def body(c):
        (it, tL, tR, rstep, lstep, nshrink, need_r, need_l, phase,
         acc_cube, acc_logL, nlike) = c
        u = rand_u()

        is_ir = phase == PH_INIT_R
        tL = jnp.where(is_ir, -u * w, tL)
        tR = jnp.where(is_ir, (1.0 - u) * w, tR)

        t = jnp.where(is_ir, tR, 0.0)
        t = jnp.where(phase == PH_INIT_L, tL, t)
        t = jnp.where(phase == PH_STEP_R, w * rstep.astype(jnp.float32), t)
        t = jnp.where(phase == PH_STEP_L, -w * lstep.astype(jnp.float32), t)
        t = jnp.where(phase == PH_SHRINK, tL + u * (tR - tL), t)

        probe = x0 + t[None] * nhat
        logL = loglike_tile(probe)

        inside = (logL >= bound) & (logL > LOGZERO)
        counted = (phase != PH_DONE) & (logL > LOGZERO)
        nlike = nlike + counted.astype(jnp.int32)

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
        acc_cube = probe * accf[None] + acc_cube * (1.0 - accf)[None]
        acc_logL = jnp.where(acc, jnp.where(forced, LOGZERO, logL), acc_logL)

        phase = jnp.where(is_ir, PH_INIT_L, phase)
        phase = jnp.where(is_il, after_il, phase)
        phase = jnp.where(done_r, jnp.where(need_l != 0, PH_STEP_L, PH_SHRINK), phase)
        phase = jnp.where(done_l, PH_SHRINK, phase)
        phase = jnp.where(acc, PH_DONE, phase)
        return (it + 1, tL, tR, rstep, lstep, nshrink, need_r, need_l, phase,
                acc_cube, acc_logL, nlike)

    init = (jnp.zeros((), jnp.int32), f32(), f32(),
            i32(1), i32(1), i32(0), i32(0), i32(0), i32(PH_INIT_R),
            x0, f32(LOGZERO), nlike_ref[:, :])

    def cond(c):
        return (c[0] < MAX_INNER) & jnp.any(c[8] != PH_DONE)

    st = jax.lax.while_loop(cond, body, init)
    acc_cube, acc_logL, nlike = st[9], st[10], st[11]

    x0_ref[:, :, :] = acc_cube
    nlike_ref[:, :] = nlike
    out_cube_ref[0, :, :, :] = acc_cube
    out_logL_ref[0, :, :] = acc_logL
    nlike_out_ref[:, :] = nlike


@jax.jit
def pallas_epoch(seed, x0, bound, nhats, ws):
    """x0 (D,S,L); bound (S,L); nhats (R,D,S,L); ws (R,S,L)."""
    return pl.pallas_call(
        epoch_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R,),
            in_specs=[
                pl.BlockSpec((D, SUB, LANE), lambda r, *_: (0, 0, 0)),
                pl.BlockSpec((SUB, LANE), lambda r, *_: (0, 0)),
                pl.BlockSpec((1, D, SUB, LANE), lambda r, *_: (r, 0, 0, 0)),
                pl.BlockSpec((1, SUB, LANE), lambda r, *_: (r, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, D, SUB, LANE), lambda r, *_: (r, 0, 0, 0)),
                pl.BlockSpec((1, SUB, LANE), lambda r, *_: (r, 0, 0)),
                pl.BlockSpec((SUB, LANE), lambda r, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((D, SUB, LANE), jnp.float32),
                pltpu.VMEM((SUB, LANE), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, D, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((R, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(seed, x0, bound, nhats, ws)


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    r0 = SIGMA * math.sqrt(D) * 1.5
    bound_v = NORM - 0.5 * (r0 / SIGMA) ** 2

    x0 = 0.5 + 0.02 * jax.random.normal(key, (D, SUB, LANE))
    nh = jax.random.normal(jax.random.fold_in(key, 1), (R, D, SUB, LANE))
    nh = nh / jnp.linalg.norm(nh, axis=1, keepdims=True)
    ws = jnp.full((R, SUB, LANE), 3 * SIGMA, jnp.float32)
    bound = jnp.full((SUB, LANE), bound_v, jnp.float32)
    seed = jnp.array([1234], dtype=jnp.int32)
    args = jax.block_until_ready(jax.device_put((x0, bound, nh, ws)))

    t0 = time.perf_counter()
    cube, logL, nlike = pallas_epoch(seed, *args)
    n = int(np.asarray(nlike).sum())
    print(f"compile+first: {time.perf_counter()-t0:.1f}s evals={n}", flush=True)

    ts = []
    for rseed in range(3):
        s = jnp.array([rseed], dtype=jnp.int32)
        t0 = time.perf_counter()
        n = int(np.asarray(pallas_epoch(s, *args)[2]).sum())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"epoch: {dt*1e3:.1f}ms {n} evals -> {n/dt:,.0f} evals/s (B={B}, R={R})",
          flush=True)

    # correctness: babies inside the contour, chains move
    logL_np = np.asarray(logL)
    ok = logL_np > LOGZERO
    print("in-bound frac:", (logL_np[ok] >= bound_v - 1e-4).mean(),
          "accepted frac:", ok.mean(), flush=True)
    c = np.asarray(cube)  # (R, D, S, L)
    moved = np.abs(c[1:] - c[:-1]).sum(axis=1)
    print("chains move every repeat:", (moved > 0).all(), flush=True)
