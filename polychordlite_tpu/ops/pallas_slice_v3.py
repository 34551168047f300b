"""Free-running fused Pallas slice epoch — v3 of the TPU hot path.

The v2 kernel (``pallas_slice.py``) iterates the R slice repeats in lockstep:
its Mosaic while-loop runs until EVERY lane of the (S, 128) tile finishes the
current repeat, so converged lanes idle on stragglers.  Measured on the bench
geometry (20-D Gaussian, experiments/sim_iter_distribution.py): mean 5.5
counted evals per (lane, repeat) but a max-lane of ~14 → **39 % lane
efficiency**.  Letting every lane advance through its own repeats
independently raises that to ~68-72 % (window-4 free-running), and shrinking
the loop-carried state to two scalars removes the per-iteration VMEM copy of
the 12-array carry the v2 while-loop pays.

Design (per grid step r over grid=(R,)):

* **Direction window** — a VMEM ring of ``RC`` repeat-direction blocks
  (repeats r..r+RC-1).  The Mosaic pipeline streams block r+RC-1 in per grid
  step; the first RC-1 blocks arrive once as a "head" input.  A lane that
  accepts repeat j fetches the direction of j+1 from the ring by a RC-way
  masked select; lanes more than RC-1 repeats ahead wait (rare:
  per-lane totals concentrate, sd/mean ≈ 3 %).
* **All per-lane state in scratch refs** — the while loop carries only
  (iteration counter, continue flag); the body mutates refs in place.
* **Scalar outputs** — the kernel records only the accepted chord coordinate
  ``t`` and ``logL`` per (lane, repeat); baby *positions* are reconstructed
  outside as ``seed + cumsum(t_r * nhat_r)`` (the same f32 fma chain the
  kernel applies to x0), so no (D, S, L) baby tensor is carried or stored.
* **Exit condition** — grid step r ends when every lane has finished repeat
  r (``min(rep) > r``), checked once per 4 unrolled micro-steps; overshoot
  micro-steps do useful work on repeats > r.

Semantics are the scan engine's exactly (Neal stepping-out/shrinkage,
``src/polychord/chordal_sampling.f90:163-273``: same phases, caps, 100-shrink
logzero guard, w = 3·‖L·n̂‖); directions are byte-identical to the other
engines; the 1-D slice uniforms come from the same murmur3 counter hash as
v2 but keyed on (key, lane, repeat, within-repeat iteration), which is
trajectory-local and therefore bitwise shard- and batch-width-invariant.
Switching engines remains statistically a seed change, the contract the
reference offers when ``mpirun -np`` changes (pypolychord/polychord.py:406-412).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_slice import (
    LANE,
    SUBLANE,
    PH_INIT_R,
    PH_INIT_L,
    PH_STEP_R,
    PH_STEP_L,
    PH_SHRINK,
    PH_DONE,
    _fmix,
    _key_words,
    _mix,
    _srl,
    _sds,
    _validated_tile_logL,
)

RC = 4  # direction-window slots (measured optimum, sim_iter_distribution.py)
UNROLL = 4  # micro-steps per while-loop body


def build_epoch_fn_pallas_v3(
    calc_point_batch,
    cfg,
    axis_name: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Free-running Pallas engine with the ``build_epoch_fn`` contract."""
    tile_logL = _validated_tile_logL(calc_point_batch, cfg)
    D = cfg.n_dims
    R = cfg.total_repeats
    n_grades = len(cfg.grade_dims)
    logzero = float(cfg.logzero)
    max_step = cfg.max_step
    max_shrink = cfg.max_shrink
    rc = min(RC, R)
    # worst-case micro-steps for one repeat (a lane can span at most this
    # many transitions before a forced accept), bounding each grid step
    cap_body = (2 + 2 * max_step + max_shrink + UNROLL) // UNROLL + 4
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def _kernel(scal_ref, x0_in_ref, bound_ref, valid_ref,
                nhat_stream_ref, w_stream_ref, *rest):
        if rc > 1:
            nhat_head_ref, w_head_ref = rest[0], rest[1]
            rest = rest[2:]
        (out_t_ref, out_logL_ref, out_nlike_ref,
         ring_nhat, ring_w, x0_ref, cur_nhat_ref, cur_w_ref,
         tL_ref, tR_ref, acc_t_ref, acc_logL_ref, nlike_ref,
         phase_ref, rep_ref, it_ref, rstep_ref, lstep_ref, nshrink_ref,
         need_r_ref, need_l_ref, pending_ref, h_lane_ref) = rest

        S = bound_ref.shape[0]
        r = pl.program_id(0)
        bound = bound_ref[:, :]

        i32 = lambda v=0: jnp.full((S, LANE), v, jnp.int32)  # noqa: E731
        f32 = lambda v=0.0: jnp.full((S, LANE), v, jnp.float32)  # noqa: E731

        @pl.when(r == 0)
        def _init():
            x0_ref[...] = x0_in_ref[...]
            if rc > 1:
                for j in range(rc - 1):
                    ring_nhat[j] = nhat_head_ref[j]
                    ring_w[j] = w_head_ref[j]
            valid = valid_ref[:, :] > 0.5
            phase_ref[...] = jnp.where(valid, PH_INIT_R, PH_DONE).astype(jnp.int32)
            rep_ref[...] = jnp.where(valid, 0, R).astype(jnp.int32)
            pending_ref[...] = jnp.where(valid, 1, 0).astype(jnp.int32)
            it_ref[...] = i32()
            rstep_ref[...] = i32(1)
            lstep_ref[...] = i32(1)
            nshrink_ref[...] = i32()
            need_r_ref[...] = i32()
            need_l_ref[...] = i32()
            tL_ref[...] = f32()
            tR_ref[...] = f32()
            cur_w_ref[...] = f32(1.0)
            cur_nhat_ref[...] = jnp.zeros_like(cur_nhat_ref)
            lane = (
                jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
                * np.int32(LANE)
                + jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 1)
                + scal_ref[2]
            )
            h_lane_ref[...] = _mix(
                _mix(i32(scal_ref[0]), i32(scal_ref[1])), lane
            )
            for j in range(rc):
                acc_t_ref[j] = f32()
                acc_logL_ref[j] = f32(logzero)
                nlike_ref[j] = i32()

        # stream the window's newest block into its ring slot (repeat
        # r+rc-1; past R-1 the clipped duplicate lands in the unused slot)
        slot_in = jax.lax.rem(r + (rc - 1), rc)
        ring_nhat[pl.ds(slot_in, 1)] = nhat_stream_ref[...]
        ring_w[pl.ds(slot_in, 1)] = w_stream_ref[...]

        window_hi = jnp.minimum(r + (rc - 1), R - 1)

        def micro():
            phase = phase_ref[...]
            rep = rep_ref[...]
            pending = pending_ref[...]
            it = it_ref[...]
            rstep = rstep_ref[...]
            lstep = lstep_ref[...]
            nshrink = nshrink_ref[...]
            need_r = need_r_ref[...]
            need_l = need_l_ref[...]
            tL = tL_ref[...]
            tR = tR_ref[...]
            x0 = x0_ref[...]

            rep_slot = jax.lax.rem(rep, rc) if rc & (rc - 1) else rep & (rc - 1)

            # fetch the direction of a freshly started repeat from the ring
            avail = (pending != 0) & (rep <= window_hi)
            cur_nhat = cur_nhat_ref[...]
            cur_w = cur_w_ref[...]
            for j in range(rc):
                m = avail & (rep_slot == j)
                cur_nhat = jnp.where(m[None], ring_nhat[j], cur_nhat)
                cur_w = jnp.where(m, ring_w[j], cur_w)
            cur_nhat_ref[...] = cur_nhat
            cur_w_ref[...] = cur_w
            pending = jnp.where(avail, 0, pending)
            active = (phase != PH_DONE) & (pending == 0)

            u = _srl(
                _fmix(_mix(_mix(h_lane_ref[...], rep), it)), 8
            ).astype(jnp.float32) * np.float32(1.0 / (1 << 24))

            w = cur_w
            is_ir = active & (phase == PH_INIT_R)
            tL = jnp.where(is_ir, -u * w, tL)
            tR = jnp.where(is_ir, (1.0 - u) * w, tR)

            t = jnp.where(is_ir, tR, 0.0)
            is_il = active & (phase == PH_INIT_L)
            is_sr = active & (phase == PH_STEP_R)
            is_sl = active & (phase == PH_STEP_L)
            is_sh = active & (phase == PH_SHRINK)
            t = jnp.where(is_il, tL, t)
            t = jnp.where(is_sr, w * rstep.astype(jnp.float32), t)
            t = jnp.where(is_sl, -w * lstep.astype(jnp.float32), t)
            t = jnp.where(is_sh, tL + u * (tR - tL), t)

            probe = x0 + t[None] * cur_nhat
            logL = tile_logL(probe)

            inside = (logL >= bound) & (logL > logzero)
            counted = active & (logL > logzero)
            cnt = counted.astype(jnp.int32)
            for j in range(rc):
                nlike_ref[j] = nlike_ref[j] + jnp.where(rep_slot == j, cnt, 0)

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

            # record the accepted chord coordinate + logL into the window ring
            logL_store = jnp.where(forced, logzero, logL)
            for j in range(rc):
                m = acc & (rep_slot == j)
                acc_t_ref[j] = jnp.where(m, t, acc_t_ref[j])
                acc_logL_ref[j] = jnp.where(m, logL_store, acc_logL_ref[j])
            x0_ref[...] = jnp.where(acc[None], probe, x0)

            phase = jnp.where(is_ir, PH_INIT_L, phase)
            phase = jnp.where(is_il, after_il, phase)
            phase = jnp.where(
                done_r, jnp.where(need_l != 0, PH_STEP_L, PH_SHRINK), phase
            )
            phase = jnp.where(done_l, PH_SHRINK, phase)

            new_rep = jnp.where(acc, rep + 1, rep)
            phase = jnp.where(
                acc, jnp.where(new_rep >= R, PH_DONE, PH_INIT_R), phase
            ).astype(jnp.int32)
            pending = jnp.where(acc & (new_rep < R), 1, pending)

            # reset per-repeat state on accept (the baby seeds the next repeat)
            phase_ref[...] = phase
            rep_ref[...] = new_rep
            pending_ref[...] = pending
            it_ref[...] = jnp.where(acc, 0, jnp.where(active, it + 1, it))
            rstep_ref[...] = jnp.where(acc, 1, rstep)
            lstep_ref[...] = jnp.where(acc, 1, lstep)
            nshrink_ref[...] = jnp.where(acc, 0, nshrink)
            need_r_ref[...] = jnp.where(acc, 0, need_r)
            need_l_ref[...] = jnp.where(acc, 0, need_l)
            tL_ref[...] = jnp.where(acc, 0.0, tL)
            tR_ref[...] = jnp.where(acc, 0.0, tR)

        def body(c):
            for _ in range(UNROLL):
                micro()
            return (c[0] + 1, jnp.any(rep_ref[...] <= r))

        def cond(c):
            return c[1] & (c[0] < cap_body)

        jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32),
                                        jnp.ones((), bool)))

        # flush repeat r's slot to the streamed outputs, clear it for r+rc
        slot_r = jax.lax.rem(r, rc)
        out_t_ref[...] = acc_t_ref[pl.ds(slot_r, 1)]
        out_logL_ref[...] = acc_logL_ref[pl.ds(slot_r, 1)]
        out_nlike_ref[...] = nlike_ref[pl.ds(slot_r, 1)]
        acc_t_ref[pl.ds(slot_r, 1)] = jnp.zeros((1, S, LANE), jnp.float32)
        acc_logL_ref[pl.ds(slot_r, 1)] = jnp.full(
            (1, S, LANE), logzero, jnp.float32
        )
        nlike_ref[pl.ds(slot_r, 1)] = jnp.zeros((1, S, LANE), jnp.int32)

    def epoch(key, seed_cube, bound, cholesky, lane_valid):
        B = seed_cube.shape[0]
        if B % (SUBLANE * LANE):
            raise ValueError(
                f"pallas engine needs B % {SUBLANE * LANE} == 0, got {B}"
            )
        S = B // LANE

        # identical direction streams to the scan/ring engines
        from .slice_kernel import _lane_keys
        from .directions import make_directions

        dir_keys, _ = _lane_keys(key, B, axis_name)
        nhats, ws, speeds = make_directions(
            dir_keys, cholesky, grade_dims=cfg.grade_dims,
            num_repeats=cfg.num_repeats, n_dims=D,
            shared_perm_key=jax.random.fold_in(key, 0x5EED),
        )  # (B,R,D), (B,R), (B,R)

        seed_f = seed_cube.astype(jnp.float32)
        x0_t = seed_f.T.reshape(D, S, LANE)
        nhat_f = nhats.astype(jnp.float32)
        nhat_t = nhat_f.transpose(1, 2, 0).reshape(R, D, S, LANE)
        w_t = ws.astype(jnp.float32).T.reshape(R, S, LANE)
        bound_t = bound.astype(jnp.float32).reshape(S, LANE)
        valid_t = lane_valid.astype(jnp.float32).reshape(S, LANE)

        k0, k1 = _key_words(key)
        if axis_name is not None:
            off = (jax.lax.axis_index(axis_name) * B).astype(jnp.int32)
        else:
            off = jnp.zeros((), jnp.int32)
        scal = jnp.stack([k0, k1, off])

        in_specs = [
            pl.BlockSpec((D, S, LANE), lambda r, *_: (0, 0, 0)),
            pl.BlockSpec((S, LANE), lambda r, *_: (0, 0)),
            pl.BlockSpec((S, LANE), lambda r, *_: (0, 0)),
            # the window's newest repeat block, clipped at R-1
            pl.BlockSpec(
                (1, D, S, LANE),
                lambda r, *_: (jnp.minimum(r + (rc - 1), R - 1), 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, S, LANE),
                lambda r, *_: (jnp.minimum(r + (rc - 1), R - 1), 0, 0),
            ),
        ]
        inputs = [scal, x0_t, bound_t, valid_t, nhat_t, w_t]
        if rc > 1:
            in_specs += [
                pl.BlockSpec((rc - 1, D, S, LANE), lambda r, *_: (0, 0, 0, 0)),
                pl.BlockSpec((rc - 1, S, LANE), lambda r, *_: (0, 0, 0)),
            ]
            inputs += [nhat_t[: rc - 1], w_t[: rc - 1]]

        t_t, logL_t, nlike_t = pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(R,),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((1, S, LANE), lambda r, *_: (r, 0, 0)),
                    pl.BlockSpec((1, S, LANE), lambda r, *_: (r, 0, 0)),
                    pl.BlockSpec((1, S, LANE), lambda r, *_: (r, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((rc, D, S, LANE), jnp.float32),  # ring_nhat
                    pltpu.VMEM((rc, S, LANE), jnp.float32),     # ring_w
                    pltpu.VMEM((D, S, LANE), jnp.float32),      # x0
                    pltpu.VMEM((D, S, LANE), jnp.float32),      # cur_nhat
                    pltpu.VMEM((S, LANE), jnp.float32),         # cur_w
                    pltpu.VMEM((S, LANE), jnp.float32),         # tL
                    pltpu.VMEM((S, LANE), jnp.float32),         # tR
                    pltpu.VMEM((rc, S, LANE), jnp.float32),     # acc_t
                    pltpu.VMEM((rc, S, LANE), jnp.float32),     # acc_logL
                    pltpu.VMEM((rc, S, LANE), jnp.int32),       # nlike ring
                    pltpu.VMEM((S, LANE), jnp.int32),           # phase
                    pltpu.VMEM((S, LANE), jnp.int32),           # rep
                    pltpu.VMEM((S, LANE), jnp.int32),           # it_rel
                    pltpu.VMEM((S, LANE), jnp.int32),           # rstep
                    pltpu.VMEM((S, LANE), jnp.int32),           # lstep
                    pltpu.VMEM((S, LANE), jnp.int32),           # nshrink
                    pltpu.VMEM((S, LANE), jnp.int32),           # need_r
                    pltpu.VMEM((S, LANE), jnp.int32),           # need_l
                    pltpu.VMEM((S, LANE), jnp.int32),           # pending
                    pltpu.VMEM((S, LANE), jnp.int32),           # h_lane
                ],
            ),
            out_shape=[
                _sds((R, S, LANE), jnp.float32, axis_name),
                _sds((R, S, LANE), jnp.float32, axis_name),
                _sds((R, S, LANE), jnp.int32, axis_name),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*inputs)

        # ---- outside the kernel: reconstruct baby positions ---------------
        t_acc = t_t.reshape(R, B).T  # (B, R)
        logL = logL_t.reshape(R, B).T  # (B, R)
        nlike_rep = nlike_t.reshape(R, B).T  # (B, R)

        # cube_r = seed + sum_{j<=r} t_j * nhat_j — the same f32 fma chain
        # the kernel applied to x0 (associativity differences are sub-ulp
        # and carry no statistical weight; logL is the kernel's record)
        deltas = t_acc[:, :, None] * nhat_f  # (B, R, D)
        cube = seed_f[:, None, :] + jnp.cumsum(deltas, axis=1)

        # theta/phi re-derivation (one batched pass, not counted in nlike)
        theta, phi, _ = calc_point_batch(cube.reshape(B * R, D))
        vmask = lane_valid[:, None, None]
        theta = jnp.where(vmask, theta.reshape(B, R, D), 0.0)
        phi = jnp.where(vmask, phi.reshape(B, R, cfg.n_phi), 0.0)

        babies = jnp.concatenate(
            [cube, theta, phi, logL[:, :, None]], axis=2
        ).reshape(B, R * (2 * D + cfg.n_phi + 1))
        nlike_g = (
            jax.nn.one_hot(speeds, n_grades, dtype=jnp.int32)
            * nlike_rep[:, :, None]
        ).sum(axis=1)  # (B, n_grades)
        packed = jnp.concatenate(
            [
                babies,
                nlike_g.astype(jnp.float32),
                jnp.zeros((B, 1), jnp.float32),  # overflow flag (never set)
            ],
            axis=1,
        )
        return packed

    return epoch
