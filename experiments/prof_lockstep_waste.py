"""Measure the lockstep waste of the fused Pallas epoch kernel.

The kernel's Mosaic while-loop runs until EVERY lane in the (S, 128) tile is
DONE, so converged lanes idle while stragglers shrink.  This experiment
instruments the kernel to also output, per repeat:

  * iters  — the while-loop iteration count actually executed (the max-lane
             cost, x4 micro-steps per iteration)
  * nlike  — counted (sequential-semantics) likelihood evals per lane

Lane efficiency = mean(nlike) / (4 * iters) tells us how much of the
hardware's probe evaluation throughput does useful work, i.e. the headroom a
straggler-tolerant kernel design can recover.  Run on the real chip.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math, time
import jax, jax.numpy as jnp, numpy as np
from functools import partial

from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import EpochConfig
from polychordlite_tpu.ops import pallas_slice as ps
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 20
B = 8192
R = 100
LANE, SUBLANE = ps.LANE, ps.SUBLANE


def build_instrumented(calc, cfg):
    """Copy of build_epoch_fn_pallas that additionally outputs the while-loop
    iteration count per repeat."""
    tile_logL = calc.single_logL
    logzero = float(cfg.logzero)
    max_step, max_shrink = cfg.max_step, cfg.max_shrink
    max_inner = 2 * max_step + max_shrink + 4
    PH_INIT_R, PH_INIT_L, PH_STEP_R, PH_STEP_L, PH_SHRINK, PH_DONE = range(6)

    def _kernel(scal_ref, x0_in_ref, bound_ref, valid_ref, nhat_ref, w_ref,
                out_nlike_ref, out_iters_ref, x0_ref):
        S = bound_ref.shape[0]
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            x0_ref[:, :, :] = x0_in_ref[:, :, :]

        x0 = x0_ref[:, :, :]
        nhat = nhat_ref[0]
        w = w_ref[0]
        bound = bound_ref[:, :]
        valid = valid_ref[:, :] > 0.5

        lane = (
            jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0) * np.int32(LANE)
            + jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 1)
            + scal_ref[2]
        )
        h0 = jnp.full((S, LANE), scal_ref[0], jnp.int32)
        h_base = ps._mix(ps._mix(ps._mix(h0, jnp.full((S, LANE), scal_ref[1], jnp.int32)),
                           lane),
                      jnp.full((S, LANE), r, jnp.int32))

        f32 = lambda v=0.0: jnp.full((S, LANE), v, jnp.float32)
        i32 = lambda v=0: jnp.full((S, LANE), v, jnp.int32)

        def micro(c):
            (it, tL, tR, rstep, lstep, nshrink, need_r, need_l, phase,
             acc_cube, acc_logL, nlike) = c
            u = ps._srl(
                ps._fmix(ps._mix(h_base, jnp.full((S, LANE), it, jnp.int32))), 8
            ).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
            is_ir = phase == PH_INIT_R
            tL = jnp.where(is_ir, -u * w, tL)
            tR = jnp.where(is_ir, (1.0 - u) * w, tR)
            t = jnp.where(is_ir, tR, 0.0)
            t = jnp.where(phase == PH_INIT_L, tL, t)
            t = jnp.where(phase == PH_STEP_R, w * rstep.astype(jnp.float32), t)
            t = jnp.where(phase == PH_STEP_L, -w * lstep.astype(jnp.float32), t)
            t = jnp.where(phase == PH_SHRINK, tL + u * (tR - tL), t)
            probe = x0 + t[None] * nhat
            logL = tile_logL(probe)
            inside = (logL >= bound) & (logL > logzero)
            counted = (phase != PH_DONE) & (logL > logzero)
            nlike = nlike + counted.astype(jnp.int32)
            is_il = phase == PH_INIT_L
            is_sr = phase == PH_STEP_R
            is_sl = phase == PH_STEP_L
            is_sh = phase == PH_SHRINK
            need_r = jnp.where(is_ir, inside.astype(jnp.int32), need_r)
            need_l = jnp.where(is_il, inside.astype(jnp.int32), need_l)
            after_il = jnp.where(
                need_r != 0, PH_STEP_R,
                jnp.where(need_l != 0, PH_STEP_L, PH_SHRINK),
            )
            done_r = is_sr & (~inside | (rstep >= max_step))
            done_l = is_sl & (~inside | (lstep >= max_step))
            tR = jnp.where(done_r, t, tR)
            tL = jnp.where(done_l, t, tL)
            rstep = jnp.where(is_sr & ~done_r, rstep + 1, rstep)
            lstep = jnp.where(is_sl & ~done_l, lstep + 1, lstep)
            accept = is_sh & inside
            forced = is_sh & ~inside & (nshrink + 1 >= max_shrink)
            acc = accept | forced
            contract = is_sh & ~inside & ~forced
            tR = jnp.where(contract & (t > 0.0), t, tR)
            tL = jnp.where(contract & (t <= 0.0), t, tL)
            nshrink = jnp.where(contract | forced, nshrink + 1, nshrink)
            accf = jnp.where(acc, 1.0, 0.0)
            acc_cube = probe * accf[None] + acc_cube * (1.0 - accf)[None]
            acc_logL = jnp.where(acc, jnp.where(forced, logzero, logL), acc_logL)
            phase = jnp.where(is_ir, PH_INIT_L, phase)
            phase = jnp.where(is_il, after_il, phase)
            phase = jnp.where(
                done_r, jnp.where(need_l != 0, PH_STEP_L, PH_SHRINK), phase
            )
            phase = jnp.where(done_l, PH_SHRINK, phase)
            phase = jnp.where(acc, PH_DONE, phase)
            return (it + np.int32(1), tL, tR, rstep, lstep, nshrink,
                    need_r, need_l, phase, acc_cube, acc_logL, nlike)

        def body(c):
            for _ in range(4):
                c = micro(c)
            return c

        def cond(c):
            return (c[0] < max_inner) & jnp.any(c[8] != PH_DONE)

        init = (
            jnp.zeros((), jnp.int32), f32(), f32(), i32(1), i32(1), i32(0),
            i32(0), i32(0),
            jnp.where(valid, PH_INIT_R, PH_DONE).astype(jnp.int32),
            x0, f32(logzero), i32(0),
        )
        st = jax.lax.while_loop(cond, body, init)
        acc_cube, nlike = st[9], st[11]
        x0_ref[:, :, :] = acc_cube
        out_nlike_ref[0] = nlike
        out_iters_ref[0] = jnp.full((S, LANE), st[0], jnp.int32)

    def epoch(key, seed_cube, bound, cholesky, lane_valid):
        Bl = seed_cube.shape[0]
        S = Bl // LANE
        from polychordlite_tpu.ops.slice_kernel import _lane_keys
        from polychordlite_tpu.ops.directions import make_directions

        dir_keys, _ = _lane_keys(key, Bl, None)
        nhats, ws, speeds = make_directions(
            dir_keys, cholesky, grade_dims=cfg.grade_dims,
            num_repeats=cfg.num_repeats, n_dims=D,
        )
        x0_t = seed_cube.astype(jnp.float32).T.reshape(D, S, LANE)
        nhat_t = nhats.astype(jnp.float32).transpose(1, 2, 0).reshape(R, D, S, LANE)
        w_t = ws.astype(jnp.float32).T.reshape(R, S, LANE)
        bound_t = bound.astype(jnp.float32).reshape(S, LANE)
        valid_t = lane_valid.astype(jnp.float32).reshape(S, LANE)
        k0, k1 = ps._key_words(key)
        scal = jnp.stack([k0, k1, jnp.zeros((), jnp.int32)])

        nlike_t, iters_t = pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(R,),
                in_specs=[
                    pl.BlockSpec((D, S, LANE), lambda r, *_: (0, 0, 0)),
                    pl.BlockSpec((S, LANE), lambda r, *_: (0, 0)),
                    pl.BlockSpec((S, LANE), lambda r, *_: (0, 0)),
                    pl.BlockSpec((1, D, S, LANE), lambda r, *_: (r, 0, 0, 0)),
                    pl.BlockSpec((1, S, LANE), lambda r, *_: (r, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, S, LANE), lambda r, *_: (r, 0, 0)),
                    pl.BlockSpec((1, S, LANE), lambda r, *_: (r, 0, 0)),
                ],
                scratch_shapes=[pltpu.VMEM((D, S, LANE), jnp.float32)],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((R, S, LANE), jnp.int32),
                jax.ShapeDtypeStruct((R, S, LANE), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=jax.default_backend() == "cpu",
        )(scal, x0_t, bound_t, valid_t, nhat_t, w_t)
        return nlike_t, iters_t

    return epoch


def main():
    like = get_likelihood("gaussian", D)
    calc = make_batched_calculator(lambda c: c, like, D, n_derived=2)
    cfg = EpochConfig(n_dims=D, n_phi=calc.n_phi, grade_dims=(D,),
                      num_repeats=(R,), engine="pallas")
    epoch = jax.jit(build_instrumented(calc, cfg))

    key = jax.random.PRNGKey(0)
    seeds = 0.5 + 0.1 * jax.random.normal(key, (B, D))
    r0 = 0.1 * math.sqrt(D) * 1.5
    bound = -0.5 * (r0 / 0.1) ** 2 - D * (math.log(0.1) + 0.5 * math.log(2 * math.pi))
    bounds = jnp.full((B,), bound, jnp.float32)
    chol = jnp.broadcast_to(0.1 * jnp.eye(D, dtype=jnp.float32), (B, D, D))
    valid = jnp.ones((B,), bool)

    nlike_t, iters_t = jax.block_until_ready(epoch(key, seeds, bounds, chol, valid))
    t0 = time.perf_counter()
    nlike_t, iters_t = jax.block_until_ready(epoch(jax.random.PRNGKey(1), seeds, bounds, chol, valid))
    dt = time.perf_counter() - t0

    nlike = np.asarray(nlike_t)          # (R, S, LANE) counted evals per lane
    iters = np.asarray(iters_t)[:, 0, 0]  # (R,) while iterations (same all lanes)

    mean_nlike = nlike.mean()            # mean counted evals per (lane, repeat)
    micro_steps = 4.0 * iters            # micro-steps (probe evals) per repeat
    total_micro = micro_steps.sum() * B
    total_counted = nlike.sum()

    print(f"B={B} R={R} D={D}  wall={dt*1e3:.1f} ms")
    print(f"while iterations per repeat: mean={iters.mean():.1f} "
          f"min={iters.min()} max={iters.max()} (x4 micro-steps each)")
    print(f"counted evals per lane-repeat: mean={mean_nlike:.2f} "
          f"p50={np.percentile(nlike, 50):.0f} p99={np.percentile(nlike, 99):.0f} "
          f"max={nlike.max()}")
    print(f"lane efficiency (counted / hardware probes): "
          f"{total_counted / total_micro:.3f}")
    print(f"hardware probe rate: {total_micro / dt / 1e6:.1f} M probes/s")
    print(f"counted eval rate:   {total_counted / dt / 1e6:.1f} M evals/s")
    # per-repeat straggler detail for the first few repeats
    for r in range(0, R, 25):
        ml = nlike[r].mean()
        print(f"  repeat {r:3d}: iters={iters[r]:3d} micro={4*iters[r]:3d} "
              f"mean_nlike={ml:.2f} max_nlike={nlike[r].max()}")


if __name__ == "__main__":
    main()
