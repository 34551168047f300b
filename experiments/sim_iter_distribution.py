"""Closed-form simulation of the slice state machine's iteration counts.

For the bench configuration (20-D Gaussian, contour at r0 = 1.5 sigma sqrt(D),
w = 3 sigma), the chord likelihood is quadratic in t, so "inside" is the
analytic interval [t-, t+].  This simulates the EXACT Neal state machine
(chordal_sampling.f90:163-273 semantics — same as the engines) per
(lane, repeat) in vectorised numpy and reports the distribution of
per-repeat evaluation counts, the lockstep max over lane tiles of various
widths, and the projected lane efficiency of per-repeat-lockstep vs
free-running kernel designs.  This drives the v3 Pallas kernel design
without needing the (flaky) TPU tunnel.
"""
import numpy as np

D = 20
SIGMA = 0.1
R = 100
B = 8192
rng = np.random.default_rng(0)

r0 = 1.5 * SIGMA * np.sqrt(D)
w = 3.0 * SIGMA
MAX_STEP = 200
MAX_SHRINK = 100

# per-lane current displacement from centre
a = SIGMA * rng.standard_normal((B, D))

evals = np.zeros((B, R), dtype=np.int64)  # counted evals per (lane, repeat)
steps_out = np.zeros((B, R), dtype=np.int64)
shrinks = np.zeros((B, R), dtype=np.int64)

for r in range(R):
    n = rng.standard_normal((B, D))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    an = np.einsum("ij,ij->i", a, n)
    aa = np.einsum("ij,ij->i", a, a)
    disc = an**2 - (aa - r0**2)
    # all seeds are inside the contour (disc > 0); chord interval [tm, tp]
    s = np.sqrt(np.maximum(disc, 0.0))
    tm, tp = -an - s, -an + s

    u0 = rng.random(B)
    tL = -u0 * w
    tR = (1.0 - u0) * w
    ev = np.full(B, 2)  # INIT_R + INIT_L evaluations

    # stepping out: expand while the end is inside
    need_r = (tR >= tm) & (tR <= tp)
    need_l = (tL >= tm) & (tL <= tp)
    # right: ends at first k with k*w outside (k starts at 1)
    kR = np.where(need_r, np.ceil(tp / w).astype(int) + 0, 0)
    # evaluate k=1..kR while inside; the terminating (outside) eval also counts
    # number of step evals on the right = (#k with k*w <= tp) + 1 if need_r
    nsr = np.where(need_r, np.minimum(np.floor(tp / w).astype(int), MAX_STEP) + 1, 0)
    tR = np.where(need_r, np.minimum(np.floor(tp / w) + 1, MAX_STEP) * w, tR)
    nsl = np.where(need_l, np.minimum(np.floor(-tm / w).astype(int), MAX_STEP) + 1, 0)
    tL = np.where(need_l, -np.minimum(np.floor(-tm / w) + 1, MAX_STEP) * w, tL)
    ev += nsr + nsl
    steps_out[:, r] = nsr + nsl

    # shrinkage
    t_acc = np.zeros(B)
    active = np.ones(B, bool)
    nsh = np.zeros(B, dtype=np.int64)
    for k in range(MAX_SHRINK):
        u = rng.random(B)
        t = tL + u * (tR - tL)
        ev += active
        inside = (t >= tm) & (t <= tp)
        acc = active & inside
        t_acc = np.where(acc, t, t_acc)
        rej = active & ~inside
        tR = np.where(rej & (t > 0), t, tR)
        tL = np.where(rej & (t <= 0), t, tL)
        nsh += active
        active = rej
        if not active.any():
            break
    shrinks[:, r] = nsh
    evals[:, r] = ev
    a = a + t_acc[:, None] * n

per_rep = evals  # (B, R)
tot = per_rep.sum(axis=1)  # per-lane epoch totals

print(f"counted evals per (lane, repeat): mean={per_rep.mean():.2f} "
      f"p50={np.percentile(per_rep,50):.0f} p90={np.percentile(per_rep,90):.0f} "
      f"p99={np.percentile(per_rep,99):.0f} p99.99={np.percentile(per_rep,99.99):.0f} "
      f"max={per_rep.max()}")
print(f"  of which step-outs: mean={steps_out.mean():.2f} max={steps_out.max()}; "
      f"shrinks: mean={shrinks.mean():.2f} max={shrinks.max()}")
print(f"per-lane epoch totals: mean={tot.mean():.0f} sd={tot.std():.0f} "
      f"max={tot.max()}")

for W in (1024, 2048, 8192):
    nt = B // W
    m = per_rep.reshape(nt, W, R).max(axis=1)  # (tiles, R) lockstep iterations
    lock = m.sum(axis=1).mean() * 1.0
    eff = per_rep.mean() * R / lock
    print(f"per-repeat lockstep, tile {W:5d}: iterations/epoch = {lock:7.0f} "
          f"(mean max/repeat {m.mean():5.1f}), lane efficiency = {eff:.3f}")

for W in (1024, 8192):
    nt = B // W
    m = tot.reshape(nt, W).max(axis=1).mean()
    eff = tot.mean() / m
    print(f"free-running,        tile {W:5d}: iterations/epoch = {m:7.0f}, "
          f"lane efficiency = {eff:.3f}")

# K-probe variants: INIT merged (1 iteration, 2 probes), step-outs in ceil(n/K),
# shrinks speculative chain in ceil(n/K) iterations
for K in (2, 4):
    it_k = 1 + np.ceil(steps_out / K) + np.ceil(shrinks / K)
    m8 = it_k.reshape(1, B, R).max(axis=1).sum()
    probes = m8 * K  # per-lane hardware probes under lockstep
    eff = per_rep.mean() * R / probes
    tot_k = it_k.sum(axis=1)
    mf = tot_k.max()
    eff_f = per_rep.mean() * R / (mf * K)
    print(f"K={K} probes/iter: lockstep-8192 iters/epoch = {m8:6.0f} "
          f"(probe eff {eff:.3f}); free-running iters = {mf:6.0f} "
          f"(probe eff {eff_f:.3f})")
