"""Sliding-window fused Pallas slice epoch — v4 of the TPU hot path.

Why v3 was slow (measured, experiments/prof_v3_iters.py + prof_tunnel_slope.py):
its grid=(R,) structure ends grid step r only when EVERY lane of the whole
batch has finished repeat r, and its direction window is only 4 repeats deep
— so the measured lane efficiency on chip was **0.12** (4468 micro-steps x
8192 lanes for 4.5M probes; 25.5 ms/epoch, 177M evals/s), against 0.68 for
the idealised free-running simulation.  The barrier, not the body, was the
cost: the while-loop body runs near the vector-op floor
(experiments/prof_pallas_while.py).

v4 removes the barrier (design validated by experiments/sim_sliding_window.py,
predicted lane efficiency 0.75-0.85):

* **Grid over lane chunks** (``(SC, 128)`` f32 tiles, SC sublane rows), not
  repeats.  Each grid step runs ONE while loop that advances its chunk's
  lanes through ALL R repeats, free-running.  Measured per-lane cost falls
  ~3x from SC=8 to SC=64 (the body is instruction-bound, not
  vector-width-bound: 2.2 us vs 5.7 us per micro-step for 8x the lanes), so
  SC defaults to the largest value the VMEM budget allows.
* **Sliding window** — a scalar ``base = min(rep)`` over the chunk lives in
  SMEM and advances continuously inside the loop; a lane stalls only while
  it is >= W-1 repeats ahead of its chunk's slowest lane.  No per-repeat
  flush, no cross-chunk coupling.
* **Directions by manual DMA** — the whitened directions + widths for the
  chunk, packed ``(R, D+1, SC, LANE)``, stay in HBM (``pltpu.ANY``); a
  W-slot VMEM ring (slot = repeat mod W) is refilled by one async copy per
  window advance, started W-1 advances before first use and waited one
  advance before first use.  VMEM use is bounded regardless of R.
* **Outputs** — the packed [t, logL, nlike] records live in a per-chunk
  VMEM block when ``R*3*SC*128*4`` bytes fit (written by W-way masked
  read-modify-write at scalar window indices), else in a W-slot VMEM ring
  flushed to HBM by one synchronous copy per window advance.  Baby
  positions are reconstructed outside as ``seed + cumsum(t_r * nhat_r)``.

Semantics are unchanged from v2/v3 (Neal stepping-out/shrinkage,
``src/polychord/chordal_sampling.f90:163-273``: same phases, caps, 100-shrink
logzero guard, w = 3*||L n||); directions are byte-identical to the other
engines; the 1-D slice uniforms use the same murmur3 counter hash keyed on
(key, global lane, repeat, within-repeat iteration), so results are bitwise
identical to v3 and bitwise shard-/batch-width-invariant.  On CPU (tests)
the kernel runs in interpret mode with directions read in place and outputs
resident — identical arithmetic, no DMA.
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

W = 4         # direction-ring slots; usable lookahead is W-2 (DMA mode)
UNROLL = 4    # micro-steps between window-advance checks
VMEM_BUDGET = 13 * 2**20   # leave headroom in ~16 MB of VMEM
RES_OUT_MAX = 5 * 2**20 // 2  # resident-output block cap (x2 buffered)


def _pick_sc(S: int, D: int, R: int, ring_slots: int = W) -> int:
    """Largest chunk height (sublane rows) within the VMEM budget.

    The output accounting must mirror ``epoch()``'s layout choice exactly:
    outputs are resident (a double-buffered ``(R, 3, SC, LANE)`` VMEM block)
    iff ``R*3*row <= RES_OUT_MAX``, else a ring_slots-slot scratch ring
    (single buffered) with the full array in HBM.  Budgeting ``min()`` of
    the two regardless of which one ``epoch()`` picks can undercount by
    several MB and push the Mosaic compile over VMEM, silently demoting the
    run to the scan engine.  ``ring_slots`` parameterises the direction-ring
    width so callers with a wider ring (the v5 kernel: W=8) budget their own
    layout instead of v4's (ADVICE r4).
    """
    for sc in (64, 32, 16, 8):
        if S % sc:
            continue
        row = sc * LANE * 4
        res_out_bytes = R * 3 * row
        if res_out_bytes <= RES_OUT_MAX:  # epoch() picks the resident block
            out_bytes = 2 * res_out_bytes  # double-buffered pipeline block
        else:  # epoch() picks the slot ring (scratch: single-buffered)
            out_bytes = ring_slots * 3 * row
        bytes_ = (
            ring_slots * (D + 1) * row  # direction ring
            + 2 * D * row              # x0 + cur_nhat scratch
            + 16 * row                 # per-lane state refs
            + 2 * D * row              # x0_in (double-buffered)
            + 8 * row                  # bound/valid (double-buffered)
            + out_bytes
        )
        if bytes_ <= VMEM_BUDGET:
            return sc
    return 8


def build_epoch_fn_pallas_v4(
    calc_point_batch,
    cfg,
    axis_name: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Sliding-window Pallas engine with the ``build_epoch_fn`` contract."""
    tile_logL = _validated_tile_logL(calc_point_batch, cfg)
    D = cfg.n_dims
    R = cfg.total_repeats
    n_grades = len(cfg.grade_dims)
    logzero = float(cfg.logzero)
    max_step = cfg.max_step
    max_shrink = cfg.max_shrink
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    resident = interpret  # interpret mode: no DMA, read directions in place
    w_ring = min(W, max(2, R))
    # usable lookahead: how far a lane may run ahead of base.  DMA mode keeps
    # the slot being refilled out of the window.
    usable = w_ring - 1 if resident else max(1, w_ring - 2)
    cap_iters = (R * (2 * max_step + max_shrink + 8)) // UNROLL + 8

    def make_kernel(SC: int, res_out: bool):
        def _kernel(scal_ref, x0_in_ref, bound_ref, valid_ref, stream_ref,
                    out_ref, *rest):
            rest = list(rest)
            ring_ref = rest.pop(0)
            out_ring = None if res_out else rest.pop(0)
            (x0_ref, cur_nhat_ref, cur_w_ref, tL_ref, tR_ref,
             phase_ref, rep_ref, it_ref, rstep_ref, lstep_ref,
             nshrink_ref, need_r_ref, need_l_ref, pending_ref,
             h_lane_ref, base_ref) = rest[:16]
            rest = rest[16:]
            sem = rest.pop(0) if not resident else None
            sem_out = rest.pop(0) if (not resident and not res_out) else None

            c = pl.program_id(0)
            bound = bound_ref[:, :]

            i32 = lambda v=0: jnp.full((SC, LANE), v, jnp.int32)  # noqa: E731
            f32 = lambda v=0.0: jnp.full((SC, LANE), v, jnp.float32)  # noqa: E731

            def ring_init_block(n):
                return jnp.concatenate(
                    [
                        jnp.zeros((n, 1, SC, LANE), jnp.float32),
                        jnp.full((n, 1, SC, LANE), logzero, jnp.float32),
                        jnp.zeros((n, 1, SC, LANE), jnp.float32),
                    ],
                    axis=1,
                )

            # ---- per-chunk init (every grid step) --------------------------
            x0_ref[...] = x0_in_ref[...]
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
                (jax.lax.broadcasted_iota(jnp.int32, (SC, LANE), 0)
                 + c * np.int32(SC)) * np.int32(LANE)
                + jax.lax.broadcasted_iota(jnp.int32, (SC, LANE), 1)
                + scal_ref[2]
            )
            h_lane_ref[...] = _mix(_mix(i32(scal_ref[0]), i32(scal_ref[1])), lane)
            base_ref[0] = 0
            if res_out:
                out_ref[...] = ring_init_block(R)
            else:
                out_ring[...] = ring_init_block(w_ring)

            if not resident:
                # prime the ring: slots 0..w_ring-1 <- repeats 0..w_ring-1
                for j in range(w_ring):
                    if j < R:
                        pltpu.make_async_copy(
                            stream_ref.at[c, j], ring_ref.at[j], sem.at[j]
                        ).start()
                for j in range(min(usable + 1, R)):
                    pltpu.make_async_copy(
                        stream_ref.at[c, j], ring_ref.at[j], sem.at[j]
                    ).wait()

            def slot_src(j, base):
                """Direction block of window slot j (slot = repeat mod W)."""
                if resident:
                    m = base + ((j - base) % w_ring)
                    m = jnp.minimum(m, R - 1)
                    return stream_ref[c, m]
                return ring_ref[j]

            def micro():
                base = base_ref[0]
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

                rep_slot = jax.lax.rem(rep, w_ring)

                # fetch the direction of a freshly started repeat
                avail = (pending != 0) & (rep <= base + usable) & (rep < R)
                cur_nhat = cur_nhat_ref[...]
                cur_w = cur_w_ref[...]
                for j in range(w_ring):
                    m = avail & (rep_slot == j)
                    blk = slot_src(j, base)
                    cur_nhat = jnp.where(m[None], blk[:D], cur_nhat)
                    cur_w = jnp.where(m, blk[D], cur_w)
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

                # window-indexed output read-modify-write: accepted (t, logL)
                # and the per-(lane, repeat) eval count
                logL_store = jnp.where(forced, logzero, logL)
                cnt = counted.astype(jnp.float32)
                for j in range(w_ring):
                    sel = rep_slot == j
                    m_acc = acc & sel
                    m_cnt = jnp.where(sel, cnt, 0.0)
                    if res_out:
                        idx = base + ((j - base) % w_ring)
                        idx = jnp.minimum(idx, R - 1)
                        old = out_ref[pl.ds(idx, 1)]  # (1, 3, SC, LANE)
                        new = jnp.stack(
                            [
                                jnp.where(m_acc, t, old[0, 0]),
                                jnp.where(m_acc, logL_store, old[0, 1]),
                                old[0, 2] + m_cnt,
                            ],
                        )[None]
                        out_ref[pl.ds(idx, 1)] = new
                    else:
                        old = out_ring[j]
                        new = jnp.stack(
                            [
                                jnp.where(m_acc, t, old[0]),
                                jnp.where(m_acc, logL_store, old[1]),
                                old[2] + m_cnt,
                            ],
                        )
                        out_ring[j] = new
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

            def flush_out(m):
                """Synchronously copy out-ring slot (m mod W) -> HBM row m,
                then re-initialise the slot (a recycled slot must flush the
                init record for repeats no lane reached)."""
                s = jax.lax.rem(m, w_ring)
                dma = pltpu.make_async_copy(
                    out_ring.at[s], out_ref.at[c, m], sem_out.at[0]
                )
                dma.start()
                dma.wait()
                out_ring[pl.ds(s, 1)] = ring_init_block(1)

            def advance_once():
                """base -> base+1: flush the completed repeat's outputs,
                refill the freed direction slot with the repeat entering DMA
                range, and wait the repeat entering the usable window (its
                copy started w_ring-2 advances ago)."""
                b = base_ref[0] + 1
                if not res_out:
                    flush_out(b - 1)
                if not resident:
                    nxt = b + w_ring - 1
                    slot_nxt = jax.lax.rem(nxt, w_ring)

                    @pl.when(nxt < R)
                    def _():
                        pltpu.make_async_copy(
                            stream_ref.at[c, nxt], ring_ref.at[slot_nxt],
                            sem.at[slot_nxt],
                        ).start()

                    exp = b + usable
                    slot_exp = jax.lax.rem(exp, w_ring)

                    @pl.when(exp < R)
                    def _():
                        pltpu.make_async_copy(
                            stream_ref.at[c, exp], ring_ref.at[slot_exp],
                            sem.at[slot_exp],
                        ).wait()

                base_ref[0] = b

            def body(carry):
                for _ in range(UNROLL):
                    micro()
                rep_min = jnp.min(rep_ref[...])
                for _ in range(UNROLL):
                    @pl.when((base_ref[0] < rep_min) & (base_ref[0] < R - 1))
                    def _():
                        advance_once()
                return (carry[0] + 1, jnp.any(rep_ref[...] < R))

            def cond(carry):
                return carry[1] & (carry[0] < cap_iters)

            jax.lax.while_loop(cond, body,
                               (jnp.zeros((), jnp.int32), jnp.ones((), bool)))

            if not res_out:
                # drain: repeats base..R-1 still live in the ring; recycled
                # slots flush their (re-initialised) records for repeats no
                # lane reached (e.g. all-invalid chunks)
                def drain(m, _):
                    flush_out(m)
                    return 0
                jax.lax.fori_loop(base_ref[0], R, drain, 0)

        return _kernel

    def epoch(key, seed_cube, bound, cholesky, lane_valid):
        B = seed_cube.shape[0]
        if B % (8 * LANE):
            raise ValueError(
                f"pallas engine needs B % {8 * LANE} == 0, got {B}"
            )
        S = B // LANE
        SC = _pick_sc(S, D, R)
        n_chunks = S // SC
        res_out = resident or (R * 3 * SC * LANE * 4 <= RES_OUT_MAX)

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
        # packed per-chunk stream: [c, r, 0:D]=nhat, [c, r, D]=w
        stream = jnp.concatenate(
            [
                nhat_f.reshape(n_chunks, SC, LANE, R, D).transpose(0, 3, 4, 1, 2),
                ws.astype(jnp.float32)
                .reshape(n_chunks, SC, LANE, R, 1)
                .transpose(0, 3, 4, 1, 2),
            ],
            axis=2,
        )  # (n_chunks, R, D+1, SC, LANE)
        bound_t = bound.astype(jnp.float32).reshape(S, LANE)
        valid_t = lane_valid.astype(jnp.float32).reshape(S, LANE)

        k0, k1 = _key_words(key)
        if axis_name is not None:
            off = (jax.lax.axis_index(axis_name) * B).astype(jnp.int32)
        else:
            off = jnp.zeros((), jnp.int32)
        scal = jnp.stack([k0, k1, off])

        stream_space = pltpu.ANY if not resident else pltpu.VMEM
        in_specs = [
            pl.BlockSpec((D, SC, LANE), lambda ci, *_: (0, ci, 0)),
            pl.BlockSpec((SC, LANE), lambda ci, *_: (ci, 0)),
            pl.BlockSpec((SC, LANE), lambda ci, *_: (ci, 0)),
            pl.BlockSpec(memory_space=stream_space),
        ]
        if res_out:
            out_specs = pl.BlockSpec(
                (R, 3, SC, LANE), lambda ci, *_: (0, 0, ci, 0)
            )
            out_shape = _sds((R, 3, S, LANE), jnp.float32, axis_name)
        else:
            out_specs = pl.BlockSpec(memory_space=pltpu.ANY)
            out_shape = _sds(
                (n_chunks, R, 3, SC, LANE), jnp.float32, axis_name
            )

        scratch = [pltpu.VMEM((w_ring, D + 1, SC, LANE), jnp.float32)]
        if not res_out:
            scratch.append(pltpu.VMEM((w_ring, 3, SC, LANE), jnp.float32))
        scratch += [
            pltpu.VMEM((D, SC, LANE), jnp.float32),   # x0
            pltpu.VMEM((D, SC, LANE), jnp.float32),   # cur_nhat
            pltpu.VMEM((SC, LANE), jnp.float32),      # cur_w
            pltpu.VMEM((SC, LANE), jnp.float32),      # tL
            pltpu.VMEM((SC, LANE), jnp.float32),      # tR
            pltpu.VMEM((SC, LANE), jnp.int32),        # phase
            pltpu.VMEM((SC, LANE), jnp.int32),        # rep
            pltpu.VMEM((SC, LANE), jnp.int32),        # it
            pltpu.VMEM((SC, LANE), jnp.int32),        # rstep
            pltpu.VMEM((SC, LANE), jnp.int32),        # lstep
            pltpu.VMEM((SC, LANE), jnp.int32),        # nshrink
            pltpu.VMEM((SC, LANE), jnp.int32),        # need_r
            pltpu.VMEM((SC, LANE), jnp.int32),        # need_l
            pltpu.VMEM((SC, LANE), jnp.int32),        # pending
            pltpu.VMEM((SC, LANE), jnp.int32),        # h_lane
            pltpu.SMEM((1,), jnp.int32),              # base
        ]
        if not resident:
            scratch.append(pltpu.SemaphoreType.DMA((w_ring,)))
            if not res_out:
                scratch.append(pltpu.SemaphoreType.DMA((1,)))

        out = pl.pallas_call(
            make_kernel(SC, res_out),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(scal, x0_t, bound_t, valid_t, stream)

        # ---- outside the kernel: reconstruct baby positions ---------------
        if res_out:
            t_acc = out[:, 0].reshape(R, B).T       # (B, R)
            logL = out[:, 1].reshape(R, B).T
            nlike_rep = out[:, 2].astype(jnp.int32).reshape(R, B).T
        else:
            # (n_chunks, R, 3, SC, LANE) -> (B, R) per record
            rec = out.transpose(0, 3, 4, 1, 2).reshape(B, R, 3)
            t_acc = rec[:, :, 0]
            logL = rec[:, :, 1]
            nlike_rep = rec[:, :, 2].astype(jnp.int32)

        deltas = t_acc[:, :, None] * nhat_f     # (B, R, D)
        cube = seed_f[:, None, :] + jnp.cumsum(deltas, axis=1)

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
