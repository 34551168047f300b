"""Phase-distribution study for the speculative multi-probe (v5) kernel.

Emulates the exact sequential slice state machine (the per-lane trajectory of
ops/pallas_slice_v4.py::micro) in numpy on the bench problem (D-dim gaussian,
steady-state contour: seeds uniform in the ball, bound at the ball edge,
cholesky = uniform-ball covariance), and reports

* probes consumed per chord, split by phase (INIT / STEP_R / STEP_L / SHRINK);
* sequential micro-steps per chord (== probes: 1 probe per micro-step);
* macro-steps per chord under candidate packet plans, and the speculative
  waste (extra likelihood evals that the sequential machine never consumes):

  - ``phase2``:  phase-local packets of P=2
  - ``phase4``:  phase-local packets of P=4
  - ``init4``:   INIT packet [tR, tL, w, -w] (cross-boundary speculation into
                 the first step-out probes), then phase-local P=4
  - ``init4s``:  INIT packet [tR, tL, shrink-chain...]: speculate shrink
                 after the two INIT probes (assumes both outside), P=4

The per-chord likelihood-eval *cost* of a packet design on the TPU is
macro_steps * P (every lane evaluates P probes per macro-step whether it
consumes them or not), so the figure of merit at constant vector volume
(SC * P = const) is macro_steps vs micro_steps, with waste = issued/consumed.

Run: python experiments/sim_packet_phases.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702
import math

import numpy as np

D = 20
SIGMA = 0.1
B = 20000
MAX_STEP = 100
MAX_SHRINK = 100
SEED = 5


def logL_fn(x):
    """Gaussian likelihood in cube coords (prior U[0,1]^D centred 0.5)."""
    theta = x - 0.5
    r2 = np.sum(theta * theta, axis=-1)
    return -0.5 * r2 / SIGMA**2 - D * (math.log(SIGMA) + 0.5 * math.log(2 * math.pi))


def sample_ball(rng, n, r0):
    g = rng.standard_normal((n, D))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    u = rng.random(n) ** (1.0 / D)
    return 0.5 + g * (r0 * u)[:, None]


def run_chords(rng, r0):
    """Sequential machine per chord; returns per-chord phase probe counts."""
    seeds = sample_ball(rng, B, r0)
    bound = logL_fn(0.5 + np.array([r0] + [0.0] * (D - 1)))
    # whitened direction: chol = r0/sqrt(D+2) * I (uniform-ball covariance)
    sigma_live = r0 / math.sqrt(D + 2)
    nhat = rng.standard_normal((B, D))
    nhat /= np.linalg.norm(nhat, axis=1, keepdims=True)
    w = 3.0 * sigma_live  # |L nhat| = sigma_live for isotropic chol

    counts = np.zeros((B, 4), dtype=np.int64)  # INIT, STEP_R, STEP_L, SHRINK
    shrink_rejects = np.zeros(B, dtype=np.int64)
    stepr_probes = []
    stepl_probes = []
    for i in range(B):
        x0 = seeds[i]
        n = nhat[i]
        u0 = rng.random()
        tL, tR = -u0 * w, (1.0 - u0) * w
        counts[i, 0] = 2
        in_r = logL_fn(x0 + tR * n) >= bound
        in_l = logL_fn(x0 + tL * n) >= bound
        if in_r:
            k = 1
            while True:
                counts[i, 1] += 1
                t = w * k
                if not (logL_fn(x0 + t * n) >= bound) or k >= MAX_STEP:
                    tR = t
                    break
                k += 1
            stepr_probes.append(counts[i, 1])
        if in_l:
            k = 1
            while True:
                counts[i, 2] += 1
                t = -w * k
                if not (logL_fn(x0 + t * n) >= bound) or k >= MAX_STEP:
                    tL = t
                    break
                k += 1
            stepl_probes.append(counts[i, 2])
        nsh = 0
        while True:
            counts[i, 3] += 1
            u = rng.random()
            t = tL + u * (tR - tL)
            if logL_fn(x0 + t * n) >= bound:
                break
            nsh += 1
            if nsh >= MAX_SHRINK:
                break
            if t > 0:
                tR = t
            else:
                tL = t
        shrink_rejects[i] = nsh
    return counts, shrink_rejects, stepr_probes, stepl_probes


def macro_steps(counts, plan):
    """Macro-steps per chord for a packet plan, vectorised over chords.

    counts: (B, 4) probes per phase.  Returns (steps, issued) per chord.
    """
    ini, sr, sl, sh = counts.T
    if plan == "phase2":
        P = 2
        s = np.ceil(ini / P) + np.ceil(sr / P) + np.ceil(sl / P) + np.ceil(sh / P)
    elif plan == "phase4":
        P = 4
        s = np.ceil(ini / P) + np.ceil(sr / P) + np.ceil(sl / P) + np.ceil(sh / P)
    elif plan == "init4":
        # INIT packet [tR, tL, w, -w]: consumes the 2 INIT probes plus the
        # first STEP_R probe if need_r, plus the first STEP_L probe if
        # need_l and STEP_R finished within the packet (i.e. sr <= 1)
        P = 4
        sr_left = np.maximum(sr - 1, 0)
        sl_left = np.where((sr <= 1), np.maximum(sl - 1, 0), sl)
        s = (
            1.0
            + np.ceil(sr_left / P)
            + np.ceil(sl_left / P)
            + np.ceil(sh / P)
        )
    else:
        raise ValueError(plan)
    return s, s * P


def main():
    rng = np.random.default_rng(SEED)
    # steady-state contours at a few compression stages: r0 = radius of the
    # iso-L ball.  nlive=500 20-D run spends most dead points at small logX;
    # sample a spread.
    for r0_sigma in (3.0, 2.0, 1.2):
        r0 = r0_sigma * SIGMA
        counts, shrej, srp, slp = run_chords(rng, r0)
        tot = counts.sum()
        per = counts.sum(axis=0) / B
        micro = counts.sum(axis=1)
        print(f"\n=== contour r0 = {r0_sigma} sigma ===")
        print(
            f"probes/chord {tot/B:.2f}  "
            f"[INIT {per[0]:.2f}, STEP_R {per[1]:.2f}, "
            f"STEP_L {per[2]:.2f}, SHRINK {per[3]:.2f}]"
        )
        print(
            f"P(step_r)={np.mean(counts[:,1]>0):.2f} "
            f"P(step_l)={np.mean(counts[:,2]>0):.2f} "
            f"E[steps|step_r]={np.mean(srp) if srp else 0:.2f} "
            f"shrink rejects/chord={shrej.mean():.2f}"
        )
        for plan in ("phase2", "phase4", "init4"):
            s, issued = macro_steps(counts, plan)
            print(
                f"  {plan:8s}: macro/chord {s.mean():.2f} "
                f"(vs micro {micro.mean():.2f}, "
                f"step-cut {micro.mean()/s.mean():.2f}x), "
                f"issued/consumed {issued.mean()/micro.mean():.2f}"
            )


if __name__ == "__main__":
    main()
