"""The batched whitened slice-sampling engine — the TPU hot path.

This replaces the reference's per-process sequential slice chains
(``src/polychord/chordal_sampling.f90:7-273``) and its MPI worker farm
(``src/polychord/nested_sampling.F90:445-498``) with a single jitted kernel:
B independent chains advance through a per-lane state machine, and every
iteration of the outer ``lax.while_loop`` performs ONE batched likelihood
evaluation of all B probe points, so likelihood FLOPs always reach the
MXU/VPU in (B, D) batches.

Per-lane state machine (one slice chain = R sequential 1-D slice samples,
Neal 2003 stepping-out + shrinkage, mirroring ``slice_sample``
``chordal_sampling.f90:163-273``):

    INIT_R  evaluate right end of the random initial interval  [x0-u*w, x0+(1-u)*w]
    INIT_L  evaluate left end
    STEP_R  expand right bound in unit-w steps while inside the contour
    STEP_L  expand left bound likewise
    SHRINK  draw uniformly in (tL, tR); accept if inside, else contract the
            side the draw fell on; after ``max_shrink`` failures the point is
            forcibly returned with logL = logzero ("non-deterministic
            loglikelihood" guard, chordal_sampling.f90:268-271)
    DONE    all R repeats complete (lane idles until the batch drains)

Because each chain's interval is parameterised by the scalar chord coordinate
t (probe = x0 + t * n̂ with |n̂| = 1), the bounds are two scalars per lane.
Lanes progress independently — a lane that finishes repeat r immediately
starts repeat r+1 — so there is no per-repeat barrier and the only idle work
is the tail of the final repeats.

Randomness is drawn from per-lane counter-based keys (fold_in of the epoch key
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
    """Build the jittable epoch function.

    ``epoch(key, seed_cube, bound, cholesky, lane_valid)`` runs one slice chain
    per lane and returns
    ``(babies_cube (B,R,D), babies_theta, babies_phi, babies_logL (B,R),
    nlike (B, n_grades))``.

    ``axis_name`` is set when the function runs inside ``shard_map`` over the
    chain batch; it is only used to derive *global* lane indices for the
    per-lane RNG streams (no collectives are issued — the epoch is
    embarrassingly parallel and scales linearly across the mesh).
    """
    D = cfg.n_dims
    R = cfg.total_repeats
    n_grades = len(cfg.grade_dims)
    logzero = cfg.logzero
    max_iters = R * (2 * cfg.max_step + cfg.max_shrink + 4)

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

        # --- initial per-lane state -----------------------------------------
        def first_u(k):
            k2, sub = jax.random.split(k)
            return k2, jax.random.uniform(sub, ())

        loop_keys, u0 = jax.vmap(first_u)(loop_keys)
        w0 = ws[:, 0]
        tL = -u0 * w0
        tR = (1.0 - u0) * w0
        phase = jnp.where(lane_valid, PH_INIT_R, PH_DONE).astype(jnp.int32)
        carry = dict(
            keys=loop_keys,
            x0=seed_cube.astype(jnp.float32),
            tL=tL.astype(jnp.float32),
            tR=tR.astype(jnp.float32),
            rstep=jnp.ones((B,), jnp.int32),
            lstep=jnp.ones((B,), jnp.int32),
            nshrink=jnp.zeros((B,), jnp.int32),
            need_r=jnp.zeros((B,), bool),
            need_l=jnp.zeros((B,), bool),
            phase=phase,
            r_idx=jnp.zeros((B,), jnp.int32),
            babies_cube=jnp.zeros((B, R, D), jnp.float32),
            babies_theta=jnp.zeros((B, R, D), jnp.float32),
            babies_phi=jnp.zeros((B, R, cfg.n_phi), jnp.float32),
            babies_logL=jnp.full((B, R), logzero, jnp.float32),
            nlike=jnp.zeros((B, n_grades), jnp.int32),
            iters=jnp.zeros((), jnp.int32),
        )

        if axis_name is not None:
            # Under shard_map every carry component diverges per device (each
            # device drains its own lanes' loop), so mark replicated initial
            # values as varying over the chains axis.
            def _mark(x):
                if axis_name in getattr(jax.typeof(x), "vma", ()):
                    return x
                return jax.lax.pvary(x, (axis_name,))

            carry = jax.tree.map(_mark, carry)

        lanes = jnp.arange(B)
        bound_f = bound.astype(jnp.float32)

        def cond(c):
            return jnp.any(c["phase"] != PH_DONE) & (c["iters"] < max_iters)

        def body(c):
            phase = c["phase"]
            r_gather = jnp.minimum(c["r_idx"], R - 1)
            nhat = jnp.take_along_axis(nhats, r_gather[:, None, None], axis=1)[:, 0]
            w = jnp.take_along_axis(ws, r_gather[:, None], axis=1)[:, 0]
            grade = jnp.take_along_axis(speeds, r_gather[:, None], axis=1)[:, 0]

            def draw(k):
                k2, sub = jax.random.split(k)
                return k2, jax.random.uniform(sub, (2,))

            keys, u = jax.vmap(draw)(c["keys"])
            u_shrink, u_next = u[:, 0], u[:, 1]

            # ---- probe position per lane (pre-eval) ------------------------
            t = jnp.where(phase == PH_INIT_R, c["tR"], 0.0)
            t = jnp.where(phase == PH_INIT_L, c["tL"], t)
            t = jnp.where(phase == PH_STEP_R, w * c["rstep"], t)
            t = jnp.where(phase == PH_STEP_L, -w * c["lstep"], t)
            t_shrink = c["tL"] + u_shrink * (c["tR"] - c["tL"])
            t = jnp.where(phase == PH_SHRINK, t_shrink, t)

            probe = c["x0"] + t[:, None] * nhat
            theta, phi, logL = calc_point_batch(probe)

            inside = (logL >= bound_f) & (logL > logzero)
            active = phase != PH_DONE
            counted = active & (logL > logzero)
            nlike = c["nlike"] + (
                jax.nn.one_hot(grade, n_grades, dtype=jnp.int32) * counted[:, None]
            )

            # ---- post-eval transitions (phases are mutually exclusive) -----
            is_ir = phase == PH_INIT_R
            is_il = phase == PH_INIT_L
            is_sr = phase == PH_STEP_R
            is_sl = phase == PH_STEP_L
            is_sh = phase == PH_SHRINK

            need_r = jnp.where(is_ir, inside, c["need_r"])
            need_l = jnp.where(is_il, inside, c["need_l"])

            after_init_l = jnp.where(
                need_r, PH_STEP_R, jnp.where(need_l, PH_STEP_L, PH_SHRINK)
            )

            done_r = is_sr & (~inside | (c["rstep"] >= cfg.max_step))
            done_l = is_sl & (~inside | (c["lstep"] >= cfg.max_step))
            tR = jnp.where(done_r, t, c["tR"])
            tL = jnp.where(done_l, t, c["tL"])
            rstep = jnp.where(is_sr & ~done_r, c["rstep"] + 1, c["rstep"])
            lstep = jnp.where(is_sl & ~done_l, c["lstep"] + 1, c["lstep"])

            accept = is_sh & inside
            forced = is_sh & ~inside & (c["nshrink"] + 1 >= cfg.max_shrink)
            acc = accept | forced
            contract = is_sh & ~inside & ~forced
            tR = jnp.where(contract & (t > 0.0), t, tR)
            tL = jnp.where(contract & (t <= 0.0), t, tL)
            nshrink = jnp.where(contract | forced, c["nshrink"] + 1, c["nshrink"])

            # Store the accepted baby at slot r_idx.
            logL_store = jnp.where(forced, logzero, logL)

            def store(buf, val):
                cur = buf[lanes, r_gather]
                mask = acc if val.ndim == 1 else acc[:, None]
                return buf.at[lanes, r_gather].set(jnp.where(mask, val, cur))

            babies_cube = store(c["babies_cube"], probe)
            babies_theta = store(c["babies_theta"], theta)
            babies_phi = store(c["babies_phi"], phi)
            babies_logL = store(c["babies_logL"], logL_store)

            x0 = jnp.where(acc[:, None], probe, c["x0"])
            r_idx = c["r_idx"] + acc.astype(jnp.int32)
            finished = r_idx >= R
            r_next = jnp.minimum(r_idx, R - 1)
            w_next = jnp.take_along_axis(ws, r_next[:, None], axis=1)[:, 0]
            new_rep = acc & ~finished
            tL = jnp.where(new_rep, -u_next * w_next, tL)
            tR = jnp.where(new_rep, (1.0 - u_next) * w_next, tR)
            rstep = jnp.where(acc, 1, rstep)
            lstep = jnp.where(acc, 1, lstep)
            nshrink = jnp.where(acc, 0, nshrink)

            phase = jnp.where(is_ir, PH_INIT_L, phase)
            phase = jnp.where(is_il, after_init_l, phase)
            phase = jnp.where(done_r, jnp.where(need_l, PH_STEP_L, PH_SHRINK), phase)
            phase = jnp.where(done_l, PH_SHRINK, phase)
            phase = jnp.where(acc, jnp.where(finished, PH_DONE, PH_INIT_R), phase)

            return dict(
                keys=keys,
                x0=x0,
                tL=tL,
                tR=tR,
                rstep=rstep,
                lstep=lstep,
                nshrink=nshrink,
                need_r=need_r,
                need_l=need_l,
                phase=phase.astype(jnp.int32),
                r_idx=r_idx,
                babies_cube=babies_cube,
                babies_theta=babies_theta,
                babies_phi=babies_phi,
                babies_logL=babies_logL,
                nlike=nlike,
                iters=c["iters"] + 1,
            )

        out = jax.lax.while_loop(cond, body, carry)
        # Pack every output into ONE f32 buffer: device->host transfers on a
        # tunneled TPU pay a large per-transfer latency, so the whole epoch
        # result crosses the wire in a single array.
        # Layout per lane: R * [cube(D), theta(D), phi(n_phi), logL] ++ nlike.
        per_baby = jnp.concatenate(
            [
                out["babies_cube"],
                out["babies_theta"],
                out["babies_phi"],
                out["babies_logL"][:, :, None],
            ],
            axis=2,
        )  # (B, R, 2D + n_phi + 1)
        packed = jnp.concatenate(
            [
                per_baby.reshape(B, R * (2 * D + cfg.n_phi + 1)),
                out["nlike"].astype(jnp.float32),
            ],
            axis=1,
        )
        return packed

    return epoch


def unpack_epoch(packed, cfg: EpochConfig):
    """Host-side unpack of the single epoch buffer produced by the kernel.

    Returns (cube (B,R,D), theta (B,R,D), phi (B,R,n_phi), logL (B,R),
    nlike (B, n_grades)) as float64 numpy views/copies."""
    import numpy as np

    packed = np.asarray(packed, dtype=np.float64)
    D = cfg.n_dims
    R = cfg.total_repeats
    n_grades = len(cfg.grade_dims)
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
