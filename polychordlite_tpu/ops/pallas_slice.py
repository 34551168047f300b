"""Fused Pallas slice-sampling epoch — the speed-of-light TPU hot path.

Third engine behind the contract of ``slice_kernel.build_epoch_fn`` (scan /
ring / pallas).  One ``pallas_call`` runs the WHOLE epoch: grid=(R,) iterates
the slice repeats sequentially while the chain position ``x0`` persists in a
VMEM scratch buffer, so per-iteration state never touches HBM.  Per-repeat
whitened directions stream in as ``(1, D, S, L)`` blocks (double-buffered by
the Mosaic pipeline) and accepted babies stream out the same way.  All B
lanes live in one ``(S, 128)`` register tile; the inner Neal stepping-out /
shrinkage state machine is a Mosaic ``while`` whose per-iteration cost is
~20x below the XLA ``lax.scan`` engine's (measured: experiments/
prof_pallas_while.py, experiments/pallas_epoch_v2.py — 133M vs 65M
likelihood evals/s on the 20-D Gaussian at B=8192, R=100).

Semantics mirror the reference ``slice_sample``
(``src/polychord/chordal_sampling.f90:163-273``) exactly as the scan engine
does (same phases, same stepping-out caps, same 100-shrink logzero guard).
Differences from the scan engine, documented per SURVEY §7 "determinism":

* **RNG stream** — inner-loop uniforms come from a counter-based murmur3
  finaliser hash keyed on (epoch key, GLOBAL lane id, repeat, iteration)
  in plain uint32 ops (portable between compiled Mosaic and interpret
  mode, and bitwise shard-invariant like the other engines).  The slice
  *directions* are byte-identical to the other engines (same
  ``make_directions`` on the same per-lane keys); only the 1-D slice
  uniforms differ, so switching engines is statistically equivalent to
  changing the seed — exactly the contract the reference offers when
  ``mpirun -np`` changes (``pypolychord/polychord.py:406-412``).
* **theta/phi re-derivation** — like the ring engine, the kernel carries
  only (cube, logL); theta/phi are re-derived from the accepted cubes in
  one batched post-loop evaluation (bookkeeping, not counted in nlike).
  A lane that exhausts ``max_inner`` iterations without accepting keeps
  its seed cube (the scan engine zeroes theta there; unreachable in
  practice — it needs >2*max_step+max_shrink transitions).

The likelihood runs INSIDE the kernel in tile layout ``(D, S, L)`` via a
double ``jax.vmap`` over the lane axes of the same single-point evaluator
the batched path uses — any jnp-traceable prior/likelihood whose ops Mosaic
can lower works unmodified; models that fail to lower fall back to the scan
engine at runtime (parallel/mesh.py).

Requires B to be a multiple of 8*128 = 1024 (f32 tile granularity); the
runner pads the nursery with invalid lanes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .directions import make_directions

LANE = 128
SUBLANE = 8  # f32 sublane granularity -> B must be a multiple of 8*128

# phase constants shared with slice_kernel (duplicated to keep this module
# importable without a circular import)
PH_INIT_R, PH_INIT_L, PH_STEP_R, PH_STEP_L, PH_SHRINK, PH_DONE = range(6)

# murmur3 constants as wrapped int32 (Mosaic has no uint32->f32 cast, so the
# whole hash runs in int32 with explicit logical right shifts — bitwise
# identical to the uint32 formulation)
_C1 = np.int32(np.uint32(0xCC9E2D51).astype(np.int32))
_C2 = np.int32(np.uint32(0x1B873593).astype(np.int32))
_C3 = np.int32(np.uint32(0xE6546B64).astype(np.int32))
_F1 = np.int32(np.uint32(0x85EBCA6B).astype(np.int32))
_F2 = np.int32(np.uint32(0xC2B2AE35).astype(np.int32))


def _srl(x, n):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _rotl(x, n):
    return jax.lax.shift_left(x, jnp.int32(n)) | _srl(x, 32 - n)


def _mix(h, k):
    """One murmur3 combine round on int32 tiles (wrapping arithmetic)."""
    k = k * _C1
    k = _rotl(k, 15)
    k = k * _C2
    h = h ^ k
    h = _rotl(h, 13)
    return h * np.int32(5) + _C3


def _fmix(h):
    """murmur3 avalanche finaliser."""
    h = h ^ _srl(h, 16)
    h = h * _F1
    h = h ^ _srl(h, 13)
    h = h * _F2
    return h ^ _srl(h, 16)


def _key_words(key):
    """(k0, k1) int32 scalars from either a typed or raw PRNG key."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    else:
        kd = key
    kd = jax.lax.bitcast_convert_type(kd, jnp.int32).reshape(-1)
    return kd[0], kd[-1]


def _sds(shape, dtype, axis_name):
    """ShapeDtypeStruct for a pallas_call output, marked varying over the
    shard_map axis when one is active: with jax's check_vma, a pallas_call
    inside shard_map REFUSES to trace unless the output declares its
    varying-mesh-axes — and the runner's scan fallback would otherwise
    silently demote the whole run (found via
    tests/test_parallel.py::TestPallasUnderShardMap)."""
    if axis_name is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset({axis_name}))


def _validated_tile_logL(calc_point_batch, cfg):
    """Resolve the in-kernel likelihood for the Pallas engines.

    The kernels prefer to evaluate the likelihood directly in (D, S, 128)
    tile layout — zero data movement, reductions stay on the sublane axis
    — which requires the prior/likelihood to follow the axis-0 tile
    convention (models/examples.py).  Arbitrary traced likelihoods (the
    reference's unconstrained ``loglikelihood(theta, phi)`` contract,
    ``src/polychord/interfaces.F90:438-457``) are supported by a generic
    adapter: transpose the probe tile to point-major (N, D) inside the
    kernel and vmap the single-point evaluator over it.  Validate the
    tile path numerically against the batched path — a likelihood written
    with axis-less reductions would be silently wrong in tile layout, so
    a mismatch selects the generic adapter instead.
    """
    tile_logL = getattr(calc_point_batch, "single_logL", None)
    if tile_logL is None:
        raise ValueError(
            "engine='pallas' needs a JAX-traceable prior+likelihood "
            "(host-callback models must use engine='scan')"
        )
    D = cfg.n_dims
    _vk = jax.random.PRNGKey(20240131)
    _probe = jax.random.uniform(
        _vk, (SUBLANE * LANE, D), minval=-0.05, maxval=1.05
    ).astype(jnp.float32)
    _, _, _ref = calc_point_batch(_probe)
    try:
        _got = tile_logL(_probe.T.reshape(D, SUBLANE, LANE)).reshape(-1)
        _ref_a, _got_a = np.asarray(_ref, np.float64), np.asarray(_got, np.float64)
        tile_ok = _ref_a.shape == _got_a.shape and np.allclose(
            _ref_a, _got_a, rtol=1e-4, atol=1e-4
        )
    except Exception:
        tile_ok = False

    if not tile_ok:
        point_logL = getattr(calc_point_batch, "point_logL", None)
        if point_logL is None:
            raise ValueError(
                "engine='pallas' needs a JAX-traceable prior+likelihood "
                "(host-callback models must use engine='scan')"
            )
        vmapped_logL = jax.vmap(point_logL)

        def tile_logL(cube_tile):
            """Generic adapter: (D, S, L) tile -> (S, L) logL via a
            point-major transpose + vmapped single-point evaluation."""
            D_, S_, L_ = cube_tile.shape
            flat = cube_tile.reshape(D_, S_ * L_).T
            return vmapped_logL(flat).reshape(S_, L_)

        # self-check (same math as the batched path by construction; guards
        # against exotic shapes/dtypes in user code)
        _got = tile_logL(_probe.T.reshape(D, SUBLANE, LANE)).reshape(-1)
        if not np.allclose(
            np.asarray(_ref, np.float64),
            np.asarray(_got, np.float64),
            rtol=1e-4,
            atol=1e-4,
        ):
            raise ValueError(
                "engine='pallas': likelihood evaluation disagreed with the "
                "batched path — use engine='scan'"
            )
    return tile_logL


def build_epoch_fn_pallas(
    calc_point_batch,
    cfg,
    axis_name: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Lockstep (v2) Pallas engine with the ``build_epoch_fn`` contract (see
    slice_kernel); the per-repeat-lockstep fallback behind the free-running
    v3 engine (``pallas_slice_v3.py``).

    ``calc_point_batch`` must carry a ``single_logL`` attribute (traced
    likelihood path); the host-callback path cannot run inside a kernel.
    """
    tile_logL = _validated_tile_logL(calc_point_batch, cfg)
    D = cfg.n_dims
    R = cfg.total_repeats
    n_grades = len(cfg.grade_dims)
    logzero = float(cfg.logzero)
    max_step = cfg.max_step
    max_shrink = cfg.max_shrink
    max_inner = 2 * max_step + max_shrink + 4
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def _kernel(scal_ref, x0_in_ref, bound_ref, valid_ref, nhat_ref, w_ref,
                out_cube_ref, out_logL_ref, out_nlike_ref, x0_ref):
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

        # per-(lane, repeat) hash base; the per-iteration draw finalises it
        lane = (
            jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0) * np.int32(LANE)
            + jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 1)
            + scal_ref[2]
        )
        h0 = jnp.full((S, LANE), scal_ref[0], jnp.int32)
        h_base = _mix(_mix(_mix(h0, jnp.full((S, LANE), scal_ref[1], jnp.int32)),
                           lane),
                      jnp.full((S, LANE), r, jnp.int32))

        f32 = lambda v=0.0: jnp.full((S, LANE), v, jnp.float32)  # noqa: E731
        i32 = lambda v=0: jnp.full((S, LANE), v, jnp.int32)  # noqa: E731

        def micro(c):
            (it, tL, tR, rstep, lstep, nshrink, need_r, need_l, phase,
             acc_cube, acc_logL, nlike) = c

            u = _srl(
                _fmix(_mix(h_base, jnp.full((S, LANE), it, jnp.int32))), 8
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

            # need_r/need_l live as int32 masks: Mosaic cannot carry i1
            # vectors through a while loop
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
            # 4 state-machine micro-steps per while iteration: the Mosaic
            # while's per-iteration control overhead dominates the (cheap)
            # vector work, so unrolling amortises it; DONE lanes are no-ops
            # under the phase gating, and the per-micro-step `it` counter
            # keeps the RNG stream identical to the unrolled form.
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
        acc_cube, acc_logL, nlike = st[9], st[10], st[11]

        x0_ref[:, :, :] = acc_cube  # the baby seeds the next repeat
        out_cube_ref[0] = acc_cube
        out_logL_ref[0] = acc_logL
        out_nlike_ref[0] = nlike

    def epoch(key, seed_cube, bound, cholesky, lane_valid):
        B = seed_cube.shape[0]
        if B % (SUBLANE * LANE):
            raise ValueError(
                f"pallas engine needs B % {SUBLANE * LANE} == 0, got {B}"
            )
        S = B // LANE

        # identical direction streams to the scan/ring engines
        from .slice_kernel import _lane_keys

        dir_keys, _ = _lane_keys(key, B, axis_name)
        nhats, ws, speeds = make_directions(
            dir_keys, cholesky, grade_dims=cfg.grade_dims,
            num_repeats=cfg.num_repeats, n_dims=D,
            shared_perm_key=jax.random.fold_in(key, 0x5EED),
        )  # (B,R,D), (B,R), (B,R)

        x0_t = seed_cube.astype(jnp.float32).T.reshape(D, S, LANE)
        nhat_t = nhats.astype(jnp.float32).transpose(1, 2, 0).reshape(R, D, S, LANE)
        w_t = ws.astype(jnp.float32).T.reshape(R, S, LANE)
        bound_t = bound.astype(jnp.float32).reshape(S, LANE)
        valid_t = lane_valid.astype(jnp.float32).reshape(S, LANE)

        k0, k1 = _key_words(key)
        if axis_name is not None:
            off = (jax.lax.axis_index(axis_name) * B).astype(jnp.int32)
        else:
            off = jnp.zeros((), jnp.int32)
        scal = jnp.stack([k0, k1, off])

        cube_t, logL_t, nlike_t = pl.pallas_call(
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
                    pl.BlockSpec((1, D, S, LANE), lambda r, *_: (r, 0, 0, 0)),
                    pl.BlockSpec((1, S, LANE), lambda r, *_: (r, 0, 0)),
                    pl.BlockSpec((1, S, LANE), lambda r, *_: (r, 0, 0)),
                ],
                scratch_shapes=[pltpu.VMEM((D, S, LANE), jnp.float32)],
            ),
            out_shape=[
                _sds((R, D, S, LANE), jnp.float32, axis_name),
                _sds((R, S, LANE), jnp.float32, axis_name),
                _sds((R, S, LANE), jnp.int32, axis_name),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(scal, x0_t, bound_t, valid_t, nhat_t, w_t)

        # back to the lane-major contract layout
        cube = cube_t.reshape(R, D, B).transpose(2, 0, 1)  # (B, R, D)
        logL = logL_t.reshape(R, B).T  # (B, R)
        nlike_rep = nlike_t.reshape(R, B).T  # (B, R)

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
