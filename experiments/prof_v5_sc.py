"""On-chip A/B: v4 vs v5 at several chunk heights (SC).

The v5 packet multiplies vector volume per macro-step by P=4; at v4's
best SC=64 that may overwhelm the 2.14x sequential-step cut.  Smaller SC
keeps the vector volume per macro-step near v4@64's while retaining the
step cut (the packet itself amortises the Mosaic fixed overhead that made
large SC win for v4).  Uses bench.py's K-chained slope method.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702

import bench
import polychordlite_tpu.ops.pallas_slice_v4 as v4mod
import polychordlite_tpu.ops.pallas_slice_v5 as v5mod


def main():
    dev, _, _, _ = bench.kernel_evals_per_s(engine="pallas4")
    print(f"v4 (SC=auto/64):   {dev/1e6:7.1f}M evals/s", flush=True)

    orig = v4mod._pick_sc
    for sc in (64, 32, 16, 8):
        v5mod._pick_sc = lambda S, D, R, _sc=sc: _sc if S % _sc == 0 else orig(S, D, R)
        try:
            dev, _, _, _ = bench.kernel_evals_per_s(engine="pallas5")
            print(f"v5 SC={sc:2d}:          {dev/1e6:7.1f}M evals/s", flush=True)
        except Exception as e:
            print(f"v5 SC={sc:2d}: FAILED {type(e).__name__}: {str(e)[:80]}",
                  flush=True)
    v5mod._pick_sc = orig


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# MEASURED RESULTS (v5e chip, 2026-08-21, B=8192 D=20 R=100, slope method):
#
#   v4 (SC=64):          292.7M evals/s
#   v5 P=4 W=4 SC=64:    280.2M   SC=32: 285.5M   SC=16: 280.5M   SC=8: 271.2M
#   v5 P=4 W=8 SC=64:    289.5M
#
# Verdict: the speculative packet's 2.14x sequential-step cut is fully
# offset by its ~2.2x macro-step body cost (1.87x issued probe volume +
# packet resolve).  Solving for the cost split: shared-per-step cost is
# only ~2.6x the per-probe marginal cost at SC=64 — the large-SC
# amortisation v4 already performs removed the fixed overhead that
# speculation targets.  SC-insensitivity (280M flat from SC=8..64) and the
# W=4 -> W=8 gain (+3%) show the residual stall is the direction-window
# lookahead, not vector width.  This REFUTES BASELINE.md's "<2x body cost"
# ceiling-analysis prediction for multi-probe speculation at P=4: the
# incremental path to the 10x target is NOT fewer sequential steps; it is
# (a) the direction-generation 6.5 ms (42% of the epoch) and (b) the
# shared per-step overhead itself (window selects, Mosaic scheduling).
# ---------------------------------------------------------------------------
