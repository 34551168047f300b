"""f64 escape hatch (ops/precision.py; VERDICT r3 item 8).

The reference is f64 throughout (utils.F90:6); the TPU engines are f32.
A likelihood with |logL| ~ 1e7 loses the contour test in the f32
mantissa (ulp(1e7) = 1): precision="highest" switches the scan engine to
f64 and must recover the correct evidence; f32 mode must warn.
"""

import math
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import polychordlite_tpu
from polychordlite_tpu.priors import UniformPrior

SIGMA = 0.1
NDIMS = 2
OFFSET = 1.0e7
ANALYTIC = OFFSET - NDIMS * math.log(2)


def big_like(theta):
    r2 = jnp.sum(theta**2)
    norm = -NDIMS * (math.log(SIGMA) + 0.5 * math.log(2 * math.pi))
    return OFFSET + norm - r2 / (2 * SIGMA**2), [r2]


def run_big(tmp_path, **kw):
    defaults = dict(
        nDerived=1,
        prior=UniformPrior(-1, 1),
        nlive=80,
        num_repeats=2 * NDIMS,
        read_resume=False,
        base_dir=str(tmp_path),
        file_root="p",
        seed=2,
        feedback=0,
        precision_criterion=0.01,
    )
    defaults.update(kw)
    return polychordlite_tpu.run(big_like, NDIMS, **defaults)


class TestPrecision:
    def test_highest_recovers_big_logL_evidence(self, tmp_path):
        out = run_big(tmp_path, precision="highest")
        assert abs(out.logZ - ANALYTIC) < 3 * out.logZerr + 0.2

    def test_f32_mode_warns_on_big_logL(self, tmp_path):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            run_big(tmp_path, file_root="w32", max_ndead=150)
        assert any("f32 contour" in str(x.message) for x in w)

    def test_x64_state_restored(self, tmp_path):
        import jax

        run_big(tmp_path, file_root="r", precision="highest", max_ndead=120)
        assert not jax.config.read("jax_enable_x64")
        # a subsequent default-precision run still works
        out = run_big(tmp_path, file_root="r2", max_ndead=120)
        assert np.isfinite(out.logZ)

    def test_concurrent_mixed_precision_threads(self, tmp_path):
        """The x64 scope is THREAD-LOCAL (VERDICT r4 weak-8): a
        highest-precision run and a default-precision run execute
        concurrently on separate threads of one process, both correct."""
        import threading

        results = {}
        errors = []

        def worker(name, **kw):
            try:
                results[name] = run_big(tmp_path / name, **kw)
            except Exception as e:  # surface in the main thread
                errors.append((name, e))

        t64 = threading.Thread(
            target=worker, args=("hi",), kwargs=dict(precision="highest")
        )
        t32 = threading.Thread(target=worker, args=("lo",), kwargs={})
        t64.start()
        t32.start()
        t64.join()
        t32.join()
        assert not errors, errors
        # the f64 run recovers the analytic evidence despite |logL| ~ 1e7
        out64 = results["hi"]
        assert abs(out64.logZ - ANALYTIC) < 3 * out64.logZerr + 0.2
        # the f32 run completed and was NOT flipped to x64 mid-run
        assert np.isfinite(results["lo"].logZ)
        import jax

        assert not jax.config.read("jax_enable_x64")
