"""Measured record: the direction-generation bottleneck and its fix.

All numbers: v5e chip, 2026-08-21, bench geometry (B=8192, D=20, R=100),
K-chained slope method (the ONLY trustworthy timing on the axon tunnel —
direct repeat-identical dispatches are result-MEMOISED by the terminal and
report ~0.1 ms for a 13 ms computation, which is how round 3 recorded
"dirs 6.5 ms").

Decomposition of the round-3 era 15.6 ms epoch:
  make_directions (XLA blocked-CGS2 einsums) . 13.35 ms  (85%!)
    - gaussian draws ........................   0.27 ms
    - everything but Gram-Schmidt ...........   1.74 ms
    - => blocked-CGS2 einsums ...............  11.6 ms
  v4 slice kernel + stream layout ...........  ~2-3 ms
Cause: XLA lowers each of ~84 (batch, 20, k) x (batch, 20, j) einsums as a
batched matmul padded to full MXU tiles (~1-2% utilisation).

Fix: ops/pallas_dirs.py gram_schmidt_lanes — chain axis minor, classical
CGS2 as elementwise VPU work:
  make_directions (pallas GS) ...............   2.72 ms
  full v4 epoch ............................    4.29 ms  (1048M evals/s)
  bench.py vs_baseline ......................  11.42     (was 3.005 in r3)
"""
