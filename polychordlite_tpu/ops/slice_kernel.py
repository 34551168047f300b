"""The batched whitened slice-sampling engine — the TPU hot path.

This replaces the reference's per-process sequential slice chains
(``src/polychord/chordal_sampling.f90:7-273``) and its MPI worker farm
(``src/polychord/nested_sampling.F90:445-498``) with a single jitted kernel:
B independent chains advance together, and every step of the inner loop
performs ONE batched likelihood evaluation of all B probe points, so
likelihood FLOPs always reach the MXU/VPU in (B, D) batches.

Structure (chosen for XLA/TPU memory behaviour):

* an outer ``lax.scan`` over the R slice repeats — repeats are sequential in
  the reference too (one chord at a time per chain); the scan emits each
  repeat's accepted babies as stacked outputs, so no (B, R, ·) buffer is ever
  scattered into inside a loop carry (a (B,R,·) carry makes every iteration
  cost O(B·R) in HBM rewrites);
* an inner masked ``lax.while_loop`` over the per-lane state machine for one
  repeat (Neal 2003, mirroring ``slice_sample`` chordal_sampling.f90:163-273):

      INIT_R  evaluate right end of the random interval [x0-u·w, x0+(1-u)·w]
      INIT_L  evaluate left end
      STEP_R  expand right bound in unit-w steps while inside the contour
      STEP_L  expand left bound likewise
      SHRINK  draw uniformly in (tL, tR); accept if inside, else contract the
              side the draw fell on; after ``max_shrink`` failures the point
              is returned with logL = logzero ("non-deterministic
              loglikelihood" guard, chordal_sampling.f90:268-271)
      DONE    lane finished this repeat (idles until the batch converges)

  All inner state is (B,)- or (B,D)-shaped — the loop interior is
  independent of R.

Because each chain's chord is parameterised by the scalar coordinate t
(probe = x0 + t·n̂, |n̂| = 1), the slice bounds are two scalars per lane.

Randomness comes from per-lane counter-based keys (fold_in of the epoch key
with the *global* lane index), making results bitwise independent of how the
chain batch is sharded across devices.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .directions import make_directions
from .logspace import LOG_ZERO

# Phases of the per-lane state machine.
PH_INIT_R = 0
PH_INIT_L = 1
PH_STEP_R = 2
PH_STEP_L = 3
PH_SHRINK = 4
PH_DONE = 5


class EpochConfig(NamedTuple):
    """Static configuration of the slice engine (shapes are compile-time)."""

    n_dims: int
    n_phi: int
    grade_dims: Tuple[int, ...]
    num_repeats: Tuple[int, ...]
    logzero: float = LOG_ZERO
    max_step: int = 200   # stepping-out cap (reference warns past 100 and has no cap)
    max_shrink: int = 100  # shrinkage cap (chordal_sampling.f90:240-271)

    @property
    def total_repeats(self) -> int:
        return int(sum(self.num_repeats))


def build_epoch_fn(calc_point_batch, cfg: EpochConfig, axis_name: Optional[str] = None):
    """Build the jittable epoch function (scan-over-repeats engine).

    ``epoch(key, seed_cube, bound, cholesky, lane_valid)`` runs one slice
    chain per lane and returns a single packed (B, R*(2D+n_phi+1)+n_grades)
    f32 buffer (see :func:`unpack_epoch`) — one device->host transfer per
    epoch.

    ``axis_name`` is set when running inside ``shard_map`` over the chain
    batch; it only affects the *global* lane indices of the per-lane RNG
    streams (no collectives — the epoch is embarrassingly parallel).
    """
    D = cfg.n_dims
    R = cfg.total_repeats
    n_grades = len(cfg.grade_dims)
    logzero = cfg.logzero
    max_inner = 2 * cfg.max_step + cfg.max_shrink + 4

    def epoch(key, seed_cube, bound, cholesky, lane_valid):
        B = seed_cube.shape[0]
        if axis_name is not None:
            offset = jax.lax.axis_index(axis_name) * B
        else:
            offset = 0
        lane_ids = offset + jnp.arange(B)
        dir_keys = jax.vmap(lambda i: jax.random.fold_in(key, 2 * i))(lane_ids)
        loop_keys = jax.vmap(lambda i: jax.random.fold_in(key, 2 * i + 1))(lane_ids)

        nhats, ws, speeds = make_directions(
            dir_keys,
            cholesky,
            grade_dims=cfg.grade_dims,
            num_repeats=cfg.num_repeats,
            n_dims=D,
        )
        bound_f = bound.astype(jnp.float32)
        valid = lane_valid

        def one_repeat(carry, per_repeat):
            """One slice sample per lane (slice_sample,
            chordal_sampling.f90:163-273), vectorised over the batch.

            All randomness is counter-based: draw(lane, repeat, iteration) =
            uniform(fold_in(fold_in(lane_key, repeat), iteration)).  Each
            lane advances exactly one transition per inner iteration, so its
            k-th iteration index is k regardless of how long OTHER lanes'
            loops run — results are bitwise independent of the sharding
            (threading a split key through the loop would couple lanes to
            the local batch's convergence length)."""
            x0 = carry
            nhat, w, grade, r_idx = per_repeat  # (B,D), (B,), (B,), ()

            rep_keys = jax.vmap(lambda k: jax.random.fold_in(k, r_idx))(loop_keys)

            u0 = jax.vmap(
                lambda k: jax.random.uniform(jax.random.fold_in(k, 2**30), ())
            )(rep_keys)
            tL = -u0 * w
            tR = (1.0 - u0) * w

            state = dict(
                tL=tL,
                tR=tR,
                rstep=jnp.ones((B,), jnp.int32),
                lstep=jnp.ones((B,), jnp.int32),
                nshrink=jnp.zeros((B,), jnp.int32),
                need_r=jnp.zeros((B,), bool),
                need_l=jnp.zeros((B,), bool),
                phase=jnp.where(valid, PH_INIT_R, PH_DONE).astype(jnp.int32),
                acc_cube=x0,
                acc_theta=jnp.zeros((B, D), jnp.float32),
                acc_phi=jnp.zeros((B, cfg.n_phi), jnp.float32),
                acc_logL=jnp.full((B,), logzero, jnp.float32),
                nlike=jnp.zeros((B,), jnp.int32),
                iters=jnp.zeros((), jnp.int32),
            )
            if axis_name is not None:

                def _mark(v):
                    if axis_name in getattr(jax.typeof(v), "vma", ()):
                        return v
                    return jax.lax.pvary(v, (axis_name,))

                state = jax.tree.map(_mark, state)

            def cond(st):
                return jnp.any(st["phase"] != PH_DONE) & (st["iters"] < max_inner)

            def body(st):
                phase = st["phase"]
                it = st["iters"]
                u = jax.vmap(
                    lambda k: jax.random.uniform(jax.random.fold_in(k, it), ())
                )(rep_keys)

                # ---- probe position (pre-eval) -------------------------
                t = jnp.where(phase == PH_INIT_R, st["tR"], 0.0)
                t = jnp.where(phase == PH_INIT_L, st["tL"], t)
                t = jnp.where(phase == PH_STEP_R, w * st["rstep"], t)
                t = jnp.where(phase == PH_STEP_L, -w * st["lstep"], t)
                t_sh = st["tL"] + u * (st["tR"] - st["tL"])
                t = jnp.where(phase == PH_SHRINK, t_sh, t)

                probe = x0 + t[:, None] * nhat
                theta, phi, logL = calc_point_batch(probe)

                inside = (logL >= bound_f) & (logL > logzero)
                counted = (phase != PH_DONE) & (logL > logzero)
                nlike = st["nlike"] + counted.astype(jnp.int32)

                is_ir = phase == PH_INIT_R
                is_il = phase == PH_INIT_L
                is_sr = phase == PH_STEP_R
                is_sl = phase == PH_STEP_L
                is_sh = phase == PH_SHRINK

                need_r = jnp.where(is_ir, inside, st["need_r"])
                need_l = jnp.where(is_il, inside, st["need_l"])
                after_init_l = jnp.where(
                    need_r, PH_STEP_R, jnp.where(need_l, PH_STEP_L, PH_SHRINK)
                )

                done_r = is_sr & (~inside | (st["rstep"] >= cfg.max_step))
                done_l = is_sl & (~inside | (st["lstep"] >= cfg.max_step))
                tR = jnp.where(done_r, t, st["tR"])
                tL = jnp.where(done_l, t, st["tL"])
                rstep = jnp.where(is_sr & ~done_r, st["rstep"] + 1, st["rstep"])
                lstep = jnp.where(is_sl & ~done_l, st["lstep"] + 1, st["lstep"])

                accept = is_sh & inside
                forced = is_sh & ~inside & (st["nshrink"] + 1 >= cfg.max_shrink)
                acc = accept | forced
                contract = is_sh & ~inside & ~forced
                tR = jnp.where(contract & (t > 0.0), t, tR)
                tL = jnp.where(contract & (t <= 0.0), t, tL)
                nshrink = jnp.where(
                    contract | forced, st["nshrink"] + 1, st["nshrink"]
                )

                logL_store = jnp.where(forced, logzero, logL)
                acc_cube = jnp.where(acc[:, None], probe, st["acc_cube"])
                acc_theta = jnp.where(acc[:, None], theta, st["acc_theta"])
                acc_phi = jnp.where(acc[:, None], phi, st["acc_phi"])
                acc_logL = jnp.where(acc, logL_store, st["acc_logL"])

                phase = jnp.where(is_ir, PH_INIT_L, phase)
                phase = jnp.where(is_il, after_init_l, phase)
                phase = jnp.where(
                    done_r, jnp.where(need_l, PH_STEP_L, PH_SHRINK), phase
                )
                phase = jnp.where(done_l, PH_SHRINK, phase)
                phase = jnp.where(acc, PH_DONE, phase)

                return dict(
                    tL=tL,
                    tR=tR,
                    rstep=rstep,
                    lstep=lstep,
                    nshrink=nshrink,
                    need_r=need_r,
                    need_l=need_l,
                    phase=phase.astype(jnp.int32),
                    acc_cube=acc_cube,
                    acc_theta=acc_theta,
                    acc_phi=acc_phi,
                    acc_logL=acc_logL,
                    nlike=nlike,
                    iters=st["iters"] + 1,
                )

            st = jax.lax.while_loop(cond, body, state)

            # the accepted baby becomes the next repeat's start point — even a
            # forced logzero accept, as in the reference (the chain continues
            # from the failed probe, SliceSampling chordal_sampling.f90:85-89)
            new_x0 = st["acc_cube"]
            out = jnp.concatenate(
                [
                    st["acc_cube"],
                    st["acc_theta"],
                    st["acc_phi"],
                    st["acc_logL"][:, None],
                ],
                axis=1,
            )  # (B, 2D + n_phi + 1)
            nlike_g = (
                jax.nn.one_hot(grade, n_grades, dtype=jnp.int32)
                * st["nlike"][:, None]
            )  # (B, n_grades)
            return new_x0, (out, nlike_g)

        per_repeat = (
            jnp.swapaxes(nhats, 0, 1),  # (R, B, D)
            jnp.swapaxes(ws, 0, 1),  # (R, B)
            jnp.swapaxes(speeds, 0, 1),  # (R, B)
            jnp.arange(R),  # repeat indices for the RNG streams
        )
        x_final, (outs, nlike_g) = jax.lax.scan(
            one_repeat, seed_cube.astype(jnp.float32), per_repeat
        )
        # outs: (R, B, 2D+n_phi+1) -> (B, R*(2D+n_phi+1));
        # nlike_g: (R, B, n_grades) -> (B, n_grades)
        stride = 2 * D + cfg.n_phi + 1
        babies = jnp.swapaxes(outs, 0, 1).reshape(B, R * stride)
        nlike = nlike_g.sum(axis=0)
        packed = jnp.concatenate([babies, nlike.astype(jnp.float32)], axis=1)
        return packed

    return epoch


def build_epoch_fn_fused(
    calc_point_batch, cfg: EpochConfig, axis_name: Optional[str] = None
):
    """Fused persistent-lane engine (EXPERIMENTAL — not the default).

    Same contract as :func:`build_epoch_fn` and bitwise-identical output
    (tested), but each lane advances through its OWN R repeats inside one
    ``lax.while_loop``: a lane that accepts repeat r immediately starts
    repeat r+1 next iteration, instead of idling until the slowest lane of
    the batch finishes r.  With the scan engine the batch pays
    R x max-per-repeat iterations (lane efficiency ~9% measured at B=8192);
    fused, it pays max-over-lanes of the per-lane totals — the tail sync
    happens once per epoch rather than once per repeat.

    Measured on TPU this is ~30x SLOWER than the scan engine at B=8192,
    R=100: the per-lane dynamic direction gather and baby scatter each
    iteration lower to serialised per-index TPU gather/scatter.  Kept as the
    semantic stepping stone for the Pallas kernel (which gets per-lane
    progress with VMEM-resident state instead of HBM gather/scatter).

    Bitwise identity holds because the randomness is counter-based per
    (lane, repeat, iteration-within-repeat): draws never depend on when other
    lanes converge, in either engine.
    """
    D = cfg.n_dims
    R = cfg.total_repeats
    n_grades = len(cfg.grade_dims)
    logzero = cfg.logzero
    stride = 2 * D + cfg.n_phi + 1
    max_total = R * (2 * cfg.max_step + cfg.max_shrink + 4)
    U0_CODE = 2**30  # iteration code reserved for the initial-interval draw

    def epoch(key, seed_cube, bound, cholesky, lane_valid):
        B = seed_cube.shape[0]
        if axis_name is not None:
            offset = jax.lax.axis_index(axis_name) * B
        else:
            offset = 0
        lane_ids = offset + jnp.arange(B)
        dir_keys = jax.vmap(lambda i: jax.random.fold_in(key, 2 * i))(lane_ids)
        loop_keys = jax.vmap(lambda i: jax.random.fold_in(key, 2 * i + 1))(lane_ids)

        nhats, ws, speeds = make_directions(
            dir_keys,
            cholesky,
            grade_dims=cfg.grade_dims,
            num_repeats=cfg.num_repeats,
            n_dims=D,
        )  # (B,R,D), (B,R), (B,R)
        bound_f = bound.astype(jnp.float32)
        x0 = seed_cube.astype(jnp.float32)
        valid = lane_valid

        def draw(rep, code):
            """uniform(fold_in(fold_in(lane_key, repeat), code)) per lane —
            the same counter-based stream as the scan engine."""
            return jax.vmap(
                lambda k, r, c: jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(k, r), c), ()
                )
            )(loop_keys, rep, code)

        def gather_repeat(rep):
            """Per-lane direction/width/grade of repeat ``rep`` (clipped)."""
            idx = jnp.minimum(rep, R - 1)
            nhat = jnp.take_along_axis(nhats, idx[:, None, None], axis=1)[:, 0]
            w = jnp.take_along_axis(ws, idx[:, None], axis=1)[:, 0]
            grade = jnp.take_along_axis(speeds, idx[:, None], axis=1)[:, 0]
            return nhat, w, grade

        rep0 = jnp.zeros((B,), jnp.int32)
        nhat0, w0, grade0 = gather_repeat(rep0)
        u0 = draw(rep0, jnp.full((B,), U0_CODE, jnp.int32))

        # Output buffer pre-filled with the scan engine's never-accepted
        # defaults (cube = seed, theta/phi = 0, logL = logzero) so invalid
        # lanes emit identical rows.
        out0 = jnp.concatenate(
            [
                jnp.broadcast_to(x0[:, None, :], (B, R, D)),
                jnp.zeros((B, R, D + cfg.n_phi), jnp.float32),
                jnp.full((B, R, 1), logzero, jnp.float32),
            ],
            axis=2,
        )

        state = dict(
            rep=jnp.where(valid, 0, R).astype(jnp.int32),
            it=jnp.zeros((B,), jnp.int32),
            phase=jnp.where(valid, PH_INIT_R, PH_DONE).astype(jnp.int32),
            tL=-u0 * w0,
            tR=(1.0 - u0) * w0,
            rstep=jnp.ones((B,), jnp.int32),
            lstep=jnp.ones((B,), jnp.int32),
            nshrink=jnp.zeros((B,), jnp.int32),
            need_r=jnp.zeros((B,), bool),
            need_l=jnp.zeros((B,), bool),
            x0=x0,
            nhat=nhat0,
            w=w0,
            grade=grade0,
            out=out0,
            nlike_g=jnp.zeros((B, n_grades), jnp.int32),
            total_iters=jnp.zeros((), jnp.int32),
        )
        if axis_name is not None:

            def _mark(v):
                if axis_name in getattr(jax.typeof(v), "vma", ()):
                    return v
                return jax.lax.pvary(v, (axis_name,))

            state = jax.tree.map(_mark, state)

        def cond(st):
            return jnp.any(st["phase"] != PH_DONE) & (st["total_iters"] < max_total)

        def body(st):
            phase = st["phase"]
            w = st["w"]
            u = draw(st["rep"], st["it"])

            # ---- probe position (identical to the scan engine) ----------
            t = jnp.where(phase == PH_INIT_R, st["tR"], 0.0)
            t = jnp.where(phase == PH_INIT_L, st["tL"], t)
            t = jnp.where(phase == PH_STEP_R, w * st["rstep"], t)
            t = jnp.where(phase == PH_STEP_L, -w * st["lstep"], t)
            t_sh = st["tL"] + u * (st["tR"] - st["tL"])
            t = jnp.where(phase == PH_SHRINK, t_sh, t)

            probe = st["x0"] + t[:, None] * st["nhat"]
            theta, phi, logL = calc_point_batch(probe)

            inside = (logL >= bound_f) & (logL > logzero)
            counted = (phase != PH_DONE) & (logL > logzero)
            nlike_g = st["nlike_g"] + (
                jax.nn.one_hot(st["grade"], n_grades, dtype=jnp.int32)
                * counted.astype(jnp.int32)[:, None]
            )

            is_ir = phase == PH_INIT_R
            is_il = phase == PH_INIT_L
            is_sr = phase == PH_STEP_R
            is_sl = phase == PH_STEP_L
            is_sh = phase == PH_SHRINK

            need_r = jnp.where(is_ir, inside, st["need_r"])
            need_l = jnp.where(is_il, inside, st["need_l"])
            after_init_l = jnp.where(
                need_r, PH_STEP_R, jnp.where(need_l, PH_STEP_L, PH_SHRINK)
            )

            done_r = is_sr & (~inside | (st["rstep"] >= cfg.max_step))
            done_l = is_sl & (~inside | (st["lstep"] >= cfg.max_step))
            tR = jnp.where(done_r, t, st["tR"])
            tL = jnp.where(done_l, t, st["tL"])
            rstep = jnp.where(is_sr & ~done_r, st["rstep"] + 1, st["rstep"])
            lstep = jnp.where(is_sl & ~done_l, st["lstep"] + 1, st["lstep"])

            accept = is_sh & inside
            forced = is_sh & ~inside & (st["nshrink"] + 1 >= cfg.max_shrink)
            acc = accept | forced
            contract = is_sh & ~inside & ~forced
            tR = jnp.where(contract & (t > 0.0), t, tR)
            tL = jnp.where(contract & (t <= 0.0), t, tL)
            nshrink = jnp.where(contract | forced, st["nshrink"] + 1, st["nshrink"])

            phase = jnp.where(is_ir, PH_INIT_L, phase)
            phase = jnp.where(is_il, after_init_l, phase)
            phase = jnp.where(done_r, jnp.where(need_l, PH_STEP_L, PH_SHRINK), phase)
            phase = jnp.where(done_l, PH_SHRINK, phase)

            # ---- acceptance: store the baby and start the next repeat ----
            baby = jnp.concatenate(
                [probe, theta, phi, jnp.where(forced, logzero, logL)[:, None]],
                axis=1,
            )  # (B, stride)
            # out-of-range index R on non-accepting lanes → row dropped
            write_rep = jnp.where(acc, st["rep"], R)
            out = st["out"].at[jnp.arange(B), write_rep].set(
                baby, mode="drop", indices_are_sorted=True, unique_indices=True
            )

            new_rep = jnp.where(acc, st["rep"] + 1, st["rep"])
            nhat_n, w_n, grade_n = gather_repeat(new_rep)
            u0_n = draw(new_rep, jnp.full((B,), U0_CODE, jnp.int32))
            start = acc & (new_rep < R)

            return dict(
                rep=new_rep,
                it=jnp.where(acc, 0, st["it"] + 1),
                phase=jnp.where(
                    acc, jnp.where(start, PH_INIT_R, PH_DONE), phase
                ).astype(jnp.int32),
                tL=jnp.where(acc, -u0_n * w_n, tL),
                tR=jnp.where(acc, (1.0 - u0_n) * w_n, tR),
                rstep=jnp.where(acc, 1, rstep),
                lstep=jnp.where(acc, 1, lstep),
                nshrink=jnp.where(acc, 0, nshrink),
                need_r=jnp.where(acc, False, need_r),
                need_l=jnp.where(acc, False, need_l),
                x0=jnp.where(acc[:, None], probe, st["x0"]),
                nhat=jnp.where(acc[:, None], nhat_n, st["nhat"]),
                w=jnp.where(acc, w_n, st["w"]),
                grade=jnp.where(acc, grade_n, st["grade"]),
                out=out,
                nlike_g=nlike_g,
                total_iters=st["total_iters"] + 1,
            )

        st = jax.lax.while_loop(cond, body, state)
        babies = st["out"].reshape(B, R * stride)
        packed = jnp.concatenate(
            [babies, st["nlike_g"].astype(jnp.float32)], axis=1
        )
        return packed

    return epoch


def unpack_epoch(packed, cfg: EpochConfig):
    """Host-side unpack of the single epoch buffer produced by the kernel.

    Returns (cube (B,R,D), theta (B,R,D), phi (B,R,n_phi), logL (B,R),
    nlike (B, n_grades)) as float64 numpy arrays."""
    import numpy as np

    packed = np.asarray(packed, dtype=np.float64)
    D = cfg.n_dims
    R = cfg.total_repeats
    stride = 2 * D + cfg.n_phi + 1
    B = packed.shape[0]
    per_baby = packed[:, : R * stride].reshape(B, R, stride)
    cube = per_baby[:, :, :D]
    theta = per_baby[:, :, D : 2 * D]
    phi = per_baby[:, :, 2 * D : 2 * D + cfg.n_phi]
    logL = per_baby[:, :, -1]
    nlike = packed[:, R * stride :].astype(np.int64)
    return cube, theta, phi, logL, nlike


def pack_epoch_inputs(seed_cube, bound, cholesky):
    """Host-side pack of epoch inputs into one upload buffer:
    per lane [cube(D), bound, cholesky.ravel(D*D)]."""
    import numpy as np

    B, D = seed_cube.shape
    return np.concatenate(
        [seed_cube, bound[:, None], cholesky.reshape(B, D * D)], axis=1
    ).astype(np.float32)


def unpack_epoch_inputs(packed, n_dims: int):
    """Device-side unpack (inside jit) of the single input buffer."""
    D = n_dims
    seed_cube = packed[:, :D]
    bound = packed[:, D]
    chol = packed[:, D + 1 :].reshape(packed.shape[0], D, D)
    return seed_cube, bound, chol
