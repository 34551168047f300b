"""Speculative multi-probe sliding-window Pallas slice epoch — v5.

v4 (``pallas_slice_v4.py``) evaluates ONE probe per lane per micro-step; the
measured body cost splits into a *shared* part (direction-window selects,
state update, Mosaic loop overhead) and a small *per-probe* marginal part
(probe FMA + likelihood — the 20-D gaussian likelihood is ~5 of ~15
tile-passes per step).  v5 evaluates a **packet of P=4 probes per
macro-step**, amortising the shared part over ~2.1 consumed probes:

* all probe positions in a packet are computable BEFORE any likelihood
  result, because the sequential state machine's data dependencies run
  through *positions*, not likelihood values:

  - the two INIT probes (``tR = (1-u0)·w``, ``tL = -u0·w``) are
    unconditional (``src/polychord/chordal_sampling.f90:205-220``), and the
    first stepping-out probes are at the deterministic positions ``±1·w``
    → INIT packet ``[tR, tL, +w, -w]``;
  - stepping-out probes form the ladder ``w·rstep, w·(rstep+1), ...``
    (``chordal_sampling.f90:223-237``) → pure speculation under
    "still inside";
  - shrink candidates form a first-accept chain whose positions under the
    all-rejected branch depend only on the *sign* of each candidate
    (``chordal_sampling.f90:240-266``: rejection shrinks the side the
    candidate fell on), so the whole chain is precomputable from the
    uniforms alone.

* the packet is resolved AFTER the 4 likelihood evaluations by replaying
  the sequential acceptance logic in registers: slots are *consumed* in
  order until the first slot whose outcome diverts the machine (a
  stepping-out stop, a shrink accept/forced-accept, an INIT branch the
  plan did not cover); unconsumed slots are speculative waste and are
  neither counted in nlike nor allowed to affect any state.

Measured phase distribution (experiments/sim_packet_phases.py, 20-D
gaussian steady state, scale-invariant): 5.0 probes/chord = 2 INIT + 0.64
STEP_R + 0.64 STEP_L + 1.72 SHRINK; this packet plan consumes 2.14
probes/macro-step (2.14x fewer sequential steps than v4) at 1.87x issued
probes.

**Decision-exact contract with v4** (verified: experiments/check_v5.py,
tests/test_pallas_engine.py): accepted positions (cube/theta/phi columns)
and per-repeat eval counts are BITWISE identical.  The uniforms are the
same murmur3 counter hash keyed on (key, global lane, repeat, it) with
``it`` = number of probes the *sequential* machine has evaluated in this
repeat — exactly the count of consumed slots — so the draw indices match
v4's per-micro-step stream (u is consumed only by the first INIT probe and
by shrink candidates, and stepping-out consumes none,
``chordal_sampling.f90:205,246``).  Caps (max_step per side, 100-shrink
logzero guard), logzero walls and position arithmetic (f32 expression
order) are preserved slot-for-slot.  The stored logL alone may differ from
v4 within float noise (~1 ulp of the probe times the likelihood's local
Lipschitz constant): it is the same likelihood on the same probe compiled
in a different XLA graph, where fma-contraction/reduction-order choices
are not ours to pin; the accepted probe tensor itself is carried into the
chain position (not recomputed) to stop that noise compounding.

Everything else (grid over lane chunks, SMEM ``base`` sliding window,
W-slot direction ring by manual async DMA, resident-or-ring outputs,
drain) is v4's architecture unchanged.
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
from .pallas_slice_v4 import RES_OUT_MAX, _pick_sc

P = 4  # probes per macro-step (the INIT plan [tR, tL, +w, -w] needs 4)
W = 8  # direction-ring slots; v5 lanes finish repeats ~2x faster than v4's
       # micro-step machine, so v4's 4-slot window (lookahead W-2 = 2
       # repeats) stalls them; 8 slots restore the slack (measured:
       # experiments/prof_v5_sc.py)


def build_epoch_fn_pallas_v5(
    calc_point_batch,
    cfg,
    axis_name: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Speculative multi-probe Pallas engine (``build_epoch_fn`` contract)."""
    tile_logL = _validated_tile_logL(calc_point_batch, cfg)
    D = cfg.n_dims
    R = cfg.total_repeats
    n_grades = len(cfg.grade_dims)
    logzero = float(cfg.logzero)
    max_step = cfg.max_step
    max_shrink = cfg.max_shrink
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    resident = interpret
    w_ring = min(W, max(2, R))
    usable = w_ring - 1 if resident else max(1, w_ring - 2)
    # every macro-step on an active lane consumes >= 1 probe
    cap_iters = R * (2 * max_step + max_shrink + 8) + 8

    def make_kernel(SC: int, res_out: bool):
        def _kernel(scal_ref, x0_in_ref, bound_ref, valid_ref, stream_ref,
                    out_ref, *rest):
            rest = list(rest)
            ring_ref = rest.pop(0)
            out_ring = None if res_out else rest.pop(0)
            (x0_ref, cur_nhat_ref, cur_w_ref, tL_ref, tR_ref,
             phase_ref, rep_ref, it_ref, rstep_ref, lstep_ref,
             nshrink_ref, need_l_ref, pending_ref,
             h_lane_ref, base_ref) = rest[:15]
            rest = rest[15:]
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
                if resident:
                    m = base + ((j - base) % w_ring)
                    m = jnp.minimum(m, R - 1)
                    return stream_ref[c, m]
                return ring_ref[j]

            def macro():
                base = base_ref[0]
                phase = phase_ref[...]
                rep = rep_ref[...]
                pending = pending_ref[...]
                it = it_ref[...]
                rstep = rstep_ref[...]
                lstep = lstep_ref[...]
                nshrink = nshrink_ref[...]
                need_l = need_l_ref[...]
                tL = tL_ref[...]
                tR = tR_ref[...]
                x0 = x0_ref[...]

                rep_slot = jax.lax.rem(rep, w_ring)

                # fetch the direction of a freshly started repeat (shared
                # cost: once per macro-step, amortised over ~2.1 probes)
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

                # the packet's uniforms: u[j] = hash(lane, rep, it + j) —
                # identical draw indices to v4's per-micro-step stream
                # because it == consumed-probe count
                h_rep = _mix(h_lane_ref[...], rep)
                u = [
                    _srl(_fmix(_mix(h_rep, it + np.int32(j))), 8
                         ).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
                    for j in range(P)
                ]

                w = cur_w
                is_init = active & (phase == PH_INIT_R)
                is_sr = active & (phase == PH_STEP_R)
                is_sl = active & (phase == PH_STEP_L)
                is_sh = active & (phase == PH_SHRINK)

                # ---- plan the 4 probe positions ---------------------------
                # INIT: [tR0, tL0, +w, -w]  (f32 fma order matches v4)
                tR0 = (1.0 - u[0]) * w
                tL0 = -u[0] * w
                # fresh-repeat interval registers (v4 sets these at INIT_R)
                tL = jnp.where(is_init, tL0, tL)
                tR = jnp.where(is_init, tR0, tR)
                t_init = [tR0, tL0, w, -w]
                # STEP ladders: w·(rstep+j) / -w·(lstep+j)
                rstep_f = rstep.astype(jnp.float32)
                lstep_f = lstep.astype(jnp.float32)
                t_sr = [w * (rstep_f + np.float32(j)) for j in range(P)]
                t_sl = [-w * (lstep_f + np.float32(j)) for j in range(P)]
                # SHRINK chain under all-rejected: interval evolves by sign
                t_sh = []
                l_sp, r_sp = tL, tR
                for j in range(P):
                    tj = l_sp + u[j] * (r_sp - l_sp)
                    t_sh.append(tj)
                    pos = tj > 0.0
                    r_sp = jnp.where(pos, tj, r_sp)
                    l_sp = jnp.where(pos, l_sp, tj)

                t = []
                for j in range(P):
                    tj = jnp.where(is_init, t_init[j], 0.0)
                    tj = jnp.where(is_sr, t_sr[j], tj)
                    tj = jnp.where(is_sl, t_sl[j], tj)
                    tj = jnp.where(is_sh, t_sh[j], tj)
                    t.append(tj)

                # ---- evaluate the packet + shrink first-accept scan -------
                # The SHRINK resolution runs incrementally inside the eval
                # loop so the ACCEPTED probe tensor itself (not a
                # recomputation of x0 + t*nhat, which XLA may fuse with
                # different fma contraction and drift by 1 ulp from the
                # evaluated probe) is merged into the new chain position —
                # v4 stores the evaluated probe verbatim and v5 must match
                # it bitwise.
                false = i32() > i32(1)   # all-false mask (Mosaic has no
                true = i32() < i32(1)    # i1 splat: derive from compares)
                logL = []
                inside = []
                sh_nxt = true
                sh_acc = false
                sh_t = f32()
                sh_logL = f32(logzero)
                sh_cons = i32()
                sh_counted = []
                x0_acc = x0
                for j in range(P):
                    probe_j = x0 + t[j][None] * cur_nhat
                    lj = tile_logL(probe_j)
                    logL.append(lj)
                    in_j = (lj >= bound) & (lj > logzero)
                    inside.append(in_j)
                    # shrink slot j: first accept / forced-accept wins
                    use = sh_nxt
                    forced_j = ~in_j & (nshrink + np.int32(j + 1) >= max_shrink)
                    event = in_j | forced_j
                    hit = use & event
                    sh_t = jnp.where(hit, t[j], sh_t)
                    sh_logL = jnp.where(
                        hit, jnp.where(forced_j, logzero, lj), sh_logL
                    )
                    x0_acc = jnp.where((is_sh & hit)[None], probe_j, x0_acc)
                    sh_acc = sh_acc | hit
                    sh_cons = sh_cons + use.astype(jnp.int32)
                    sh_counted.append(use & (lj > logzero))
                    sh_nxt = use & ~event

                # INIT packet (consumes s0, s1 always; s2 iff in_r; s3 iff
                # in_l and STEP_R finished inside the packet)
                in_r = inside[0]
                in_l = inside[1]
                if max_step <= 1:  # static: probes 2/3 are rstep/lstep=1
                    stop2 = true
                    stop3 = true
                else:
                    stop2 = ~inside[2]
                    stop3 = ~inside[3]
                s2_used = in_r
                s3_used = in_l & (~in_r | stop2)
                init_to_sr = in_r & ~stop2                      # rstep=2
                init_to_sl = s3_used & ~stop3                   # lstep=2
                init_tR = jnp.where(in_r & stop2, t[2], tR)
                init_tL = jnp.where(s3_used & stop3, t[3], tL)
                init_cons = (
                    2 + s2_used.astype(jnp.int32) + s3_used.astype(jnp.int32)
                )
                init_phase = jnp.where(
                    init_to_sr, PH_STEP_R,
                    jnp.where(init_to_sl, PH_STEP_L, PH_SHRINK),
                )
                init_counted = [
                    logL[0] > logzero,
                    logL[1] > logzero,
                    s2_used & (logL[2] > logzero),
                    s3_used & (logL[3] > logzero),
                ]

                def ladder(stops):
                    """First-stop scan of a stepping-out packet: returns
                    (any_stop, t_stop, consumed, counted_masks)."""
                    nxt = true  # no stop before slot j
                    any_stop = false
                    t_stop = f32()
                    cons = i32()
                    counted = []
                    for j in range(P):
                        use = nxt  # slot consumed iff no earlier stop
                        hit = use & stops[j]
                        t_stop = jnp.where(hit, t[j], t_stop)
                        cons = cons + use.astype(jnp.int32)
                        counted.append(use & (logL[j] > logzero))
                        any_stop = any_stop | hit
                        nxt = use & ~stops[j]
                    return any_stop, t_stop, cons, counted

                sr_stops = [
                    ~inside[j] | (rstep + np.int32(j) >= max_step)
                    for j in range(P)
                ]
                sr_stop, sr_t, sr_cons, sr_counted = ladder(sr_stops)
                sl_stops = [
                    ~inside[j] | (lstep + np.int32(j) >= max_step)
                    for j in range(P)
                ]
                sl_stop, sl_t, sl_cons, sl_counted = ladder(sl_stops)

                # ---- commit (masked merge across phases) ------------------
                tR = jnp.where(is_init, init_tR, tR)
                tL = jnp.where(is_init, init_tL, tL)
                tR = jnp.where(is_sr & sr_stop, sr_t, tR)
                tL = jnp.where(is_sl & sl_stop, sl_t, tL)
                # all-rejected shrink packet: commit the planned interval
                tR = jnp.where(is_sh & ~sh_acc, r_sp, tR)
                tL = jnp.where(is_sh & ~sh_acc, l_sp, tL)

                need_l = jnp.where(is_init, in_l.astype(jnp.int32), need_l)
                rstep = jnp.where(is_init & init_to_sr, 2, rstep)
                lstep = jnp.where(is_init & init_to_sl, 2, lstep)
                rstep = jnp.where(is_sr & ~sr_stop, rstep + P, rstep)
                lstep = jnp.where(is_sl & ~sl_stop, lstep + P, lstep)
                # entering STEP_L after STEP_R stops: ladder starts at 1
                lstep = jnp.where(is_sr & sr_stop & (need_l != 0), 1, lstep)
                nshrink = jnp.where(is_sh, nshrink + sh_cons, nshrink)

                acc = is_sh & sh_acc
                consumed = jnp.where(is_init, init_cons, 0)
                consumed = jnp.where(is_sr, sr_cons, consumed)
                consumed = jnp.where(is_sl, sl_cons, consumed)
                consumed = jnp.where(is_sh, sh_cons, consumed)

                # per-slot counted mask -> per-repeat eval count.  Phases
                # are disjoint, so the masks sum in f32 (Mosaic cannot
                # select i1 vectors: no i8->i1 truncation).
                cnt = f32()
                for j in range(P):
                    cnt = cnt + (is_init & init_counted[j]).astype(jnp.float32)
                    cnt = cnt + (is_sr & sr_counted[j]).astype(jnp.float32)
                    cnt = cnt + (is_sl & sl_counted[j]).astype(jnp.float32)
                    cnt = cnt + (is_sh & sh_counted[j]).astype(jnp.float32)

                # window-indexed output read-modify-write (v4 layout)
                for j in range(w_ring):
                    sel = rep_slot == j
                    m_acc = acc & sel
                    m_cnt = jnp.where(sel & active, cnt, 0.0)
                    if res_out:
                        idx = base + ((j - base) % w_ring)
                        idx = jnp.minimum(idx, R - 1)
                        old = out_ref[pl.ds(idx, 1)]  # (1, 3, SC, LANE)
                        new = jnp.stack(
                            [
                                jnp.where(m_acc, sh_t, old[0, 0]),
                                jnp.where(m_acc, sh_logL, old[0, 1]),
                                old[0, 2] + m_cnt,
                            ],
                        )[None]
                        out_ref[pl.ds(idx, 1)] = new
                    else:
                        old = out_ring[j]
                        new = jnp.stack(
                            [
                                jnp.where(m_acc, sh_t, old[0]),
                                jnp.where(m_acc, sh_logL, old[1]),
                                old[2] + m_cnt,
                            ],
                        )
                        out_ring[j] = new
                x0_ref[...] = jnp.where(acc[None], x0_acc, x0)

                # phase transitions
                phase = jnp.where(is_init, init_phase, phase)
                phase = jnp.where(
                    is_sr & sr_stop,
                    jnp.where(need_l != 0, PH_STEP_L, PH_SHRINK),
                    phase,
                )
                phase = jnp.where(is_sl & sl_stop, PH_SHRINK, phase)

                new_rep = jnp.where(acc, rep + 1, rep)
                phase = jnp.where(
                    acc, jnp.where(new_rep >= R, PH_DONE, PH_INIT_R), phase
                ).astype(jnp.int32)
                pending = jnp.where(acc & (new_rep < R), 1, pending)

                phase_ref[...] = phase
                rep_ref[...] = new_rep
                pending_ref[...] = pending
                it_ref[...] = jnp.where(
                    acc, 0, jnp.where(active, it + consumed, it)
                )
                rstep_ref[...] = jnp.where(acc, 1, rstep)
                lstep_ref[...] = jnp.where(acc, 1, lstep)
                nshrink_ref[...] = jnp.where(acc, 0, nshrink)
                need_l_ref[...] = jnp.where(acc, 0, need_l)
                tL_ref[...] = jnp.where(acc, 0.0, tL)
                tR_ref[...] = jnp.where(acc, 0.0, tR)

            def flush_out(m):
                s = jax.lax.rem(m, w_ring)
                dma = pltpu.make_async_copy(
                    out_ring.at[s], out_ref.at[c, m], sem_out.at[0]
                )
                dma.start()
                dma.wait()
                out_ring[pl.ds(s, 1)] = ring_init_block(1)

            def advance_once():
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
                macro()
                rep_min = jnp.min(rep_ref[...])
                for _ in range(w_ring):
                    @pl.when((base_ref[0] < rep_min) & (base_ref[0] < R - 1))
                    def _():
                        advance_once()
                return (carry[0] + 1, jnp.any(rep_ref[...] < R))

            def cond(carry):
                return carry[1] & (carry[0] < cap_iters)

            jax.lax.while_loop(cond, body,
                               (jnp.zeros((), jnp.int32), jnp.ones((), bool)))

            if not res_out:
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
        SC = _pick_sc(S, D, R, ring_slots=W)  # v5's 8-slot ring
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
