"""Predict lane efficiency of the v4 sliding-window kernel design.

v3's measured lane efficiency on chip is ~0.12 (4468 micro-steps x 8192
lanes for 4.5M probes): the per-grid-step barrier (`min(rep) > r` over ALL
8192 lanes) plus the 4-slot window quantise every repeat to the slowest
lane's tail.  The v4 design slides a scalar `base = min(rep over tile)`
continuously inside one while loop per 1024-lane tile; a lane stalls only
when it is >= W repeats ahead of its tile's slowest lane.

This simulates that exactly, using the same analytic 20-D chord state
machine as sim_iter_distribution.py to generate per-(lane, repeat)
transition counts.
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

a = SIGMA * rng.standard_normal((B, D))
req = np.zeros((B, R), dtype=np.int64)  # transitions per (lane, repeat)

for r in range(R):
    n = rng.standard_normal((B, D))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    an = np.einsum("ij,ij->i", a, n)
    aa = np.einsum("ij,ij->i", a, a)
    disc = an**2 - (aa - r0**2)
    s = np.sqrt(np.maximum(disc, 0.0))
    tm, tp = -an - s, -an + s

    u0 = rng.random(B)
    tL = -u0 * w
    tR = (1.0 - u0) * w
    ev = np.full(B, 2)
    need_r = (tR >= tm) & (tR <= tp)
    need_l = (tL >= tm) & (tL <= tp)
    nsr = np.where(need_r, np.minimum(np.floor(tp / w).astype(int), MAX_STEP) + 1, 0)
    tR = np.where(need_r, np.minimum(np.floor(tp / w) + 1, MAX_STEP) * w, tR)
    nsl = np.where(need_l, np.minimum(np.floor(-tm / w).astype(int), MAX_STEP) + 1, 0)
    tL = np.where(need_l, -np.minimum(np.floor(-tm / w) + 1, MAX_STEP) * w, tL)
    ev += nsr + nsl

    t_acc = np.zeros(B)
    active = np.ones(B, bool)
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
        active = rej
        if not active.any():
            break
    req[:, r] = ev
    a = a + t_acc[:, None] * n

useful = req.sum()
print(f"transitions/(lane,repeat): mean={req.mean():.2f} max={req.max()}  "
      f"epoch total={useful}")


def simulate(tile, W, unroll=1):
    """Micro-steps until all lanes of each tile complete R repeats, with the
    sliding-window stall rule; returns (total micro-steps summed over tiles,
    efficiency).  unroll>1 models base/stall updates only every `unroll`
    micros (the kernel checks between unrolled bodies)."""
    n_tiles = B // tile
    total_micro = 0
    for tix in range(n_tiles):
        r_req = req[tix * tile:(tix + 1) * tile]
        cur = np.zeros(tile, dtype=np.int64)
        rem = r_req[np.arange(tile), 0].copy()
        base = 0
        micros = 0
        while True:
            done = cur >= R
            if done.all():
                break
            for _ in range(unroll):
                act = (~done) & (cur < base + W)
                rem -= act
                fin = act & (rem == 0)
                cur[fin] += 1
                done = cur >= R
                idx = np.minimum(cur, R - 1)
                rem = np.where(fin & ~done, r_req[np.arange(tile), idx], rem)
                micros += 1
            base = cur.min()
        total_micro += micros
    eff = useful / (total_micro * tile)
    return total_micro, eff


for tile in (1024, 8192):
    for W in (2, 4, 8, 16, 32):
        m, eff = simulate(tile, W, unroll=4)
        print(f"tile={tile:5d} W={W:3d}: micros(all tiles)={m:7d} "
              f"eff={eff:.3f}", flush=True)
