"""Chained-epoch ("turbo") path: K device epochs + on-device live-set
evolution per dispatch (ops/chained_epoch.py).

The conftest provides 8 virtual devices, which gates turbo OFF for default
runs (it requires a single-device mesh) — these tests force
``mesh_shape=1`` to engage it and verify: accuracy, determinism, the
host-replay/device-state verification, divergence handling, and the
epoch-count reduction that is the whole point.
"""

import json
import math
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import polychordlite_tpu
from polychordlite_tpu.priors import UniformPrior

ANALYTIC = -4 * math.log(2)


def lik(theta):
    return (
        -jnp.sum((theta / 0.1) ** 2) / 2
        - 4 * math.log(0.1 * math.sqrt(2 * math.pi)),
        [jnp.sum(theta**2)],
    )


def run_turbo(tmp_path, **kw):
    defaults = dict(
        nDerived=1,
        prior=UniformPrior(-1, 1),
        nlive=100,
        num_repeats=8,
        read_resume=False,
        write_resume=False,
        base_dir=str(tmp_path),
        file_root="t",
        seed=6,
        feedback=0,
        mesh_shape=1,
    )
    defaults.update(kw)
    return polychordlite_tpu.run(lik, 4, **defaults)


def _last_metrics(tmp_path, root="t"):
    path = os.path.join(str(tmp_path), f"{root}.metrics.jsonl")
    return [json.loads(line) for line in open(path)][-1]


class TestTurbo:
    def test_accuracy_and_no_divergence_warning(self, tmp_path):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = run_turbo(tmp_path)
        assert not any("diverged" in str(x.message) for x in w)
        assert not any("disabled" in str(x.message) for x in w)
        assert abs(out.logZ - ANALYTIC) < 3 * out.logZerr + 0.25

    def test_chains_cut_dispatch_count(self, tmp_path):
        """The observable benefit: device_epoch collects ~ ndead/(K*B)
        instead of ndead/B."""
        out_t = run_turbo(tmp_path / "a")
        rec_t = _last_metrics(tmp_path / "a")
        out_p = run_turbo(tmp_path / "b", chain_epochs=1)
        rec_p = _last_metrics(tmp_path / "b")
        assert rec_t["epochs"] < rec_p["epochs"] / 3, (
            rec_t["epochs"],
            rec_p["epochs"],
        )
        err = math.hypot(out_t.logZerr, out_p.logZerr)
        assert abs(out_t.logZ - out_p.logZ) < 3 * err + 0.2

    def test_deterministic(self, tmp_path):
        a = run_turbo(tmp_path / "a")
        b = run_turbo(tmp_path / "b")
        assert a.logZ == b.logZ and a.ndead == b.ndead

    def test_divergence_disables_turbo_loudly(self, tmp_path):
        """A corrupted device state must trip the replay verification, warn,
        disable the chained path, and still complete correctly."""
        from polychordlite_tpu.parallel import mesh as mesh_mod

        orig = mesh_mod.make_epoch_runner

        def patched(*args, **kwargs):
            run, B = orig(*args, **kwargs)
            inner = run.collect_chain

            def corrupting(handle):
                nurseries, final_ll = inner(handle)
                final_ll = np.asarray(final_ll).copy()
                if final_ll.size:
                    final_ll[0] += 1.0  # no longer matches the replay
                return nurseries, final_ll

            run.collect_chain = corrupting
            return run, B

        mesh_mod.make_epoch_runner = patched
        import polychordlite_tpu.core.nested_sampling as ns

        try:
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                out = run_turbo(tmp_path)
        finally:
            mesh_mod.make_epoch_runner = orig
        assert any("diverged" in str(x.message) for x in w)
        assert abs(out.logZ - ANALYTIC) < 3 * out.logZerr + 0.25

    def test_gated_off_on_multi_device(self, tmp_path):
        """Default 8-virtual-device mesh: turbo must not engage (the chain
        evolves a replicated live set; sharded runners keep the per-epoch
        path)."""
        out = polychordlite_tpu.run(
            lik, 4, nDerived=1, prior=UniformPrior(-1, 1), nlive=100,
            num_repeats=8, read_resume=False, write_resume=False,
            base_dir=str(tmp_path), file_root="m", seed=6, feedback=0,
        )
        rec = _last_metrics(tmp_path, "m")
        # per-epoch dispatch: epochs ~ ndead / B (B = 128: nlive=100
        # rounded up to the 8-device * 8-lane granule)
        assert rec["epochs"] >= out.ndead / 130 - 2
        assert np.isfinite(out.logZ)

    def test_max_ndead_clamps_chain_length(self, tmp_path):
        out = run_turbo(tmp_path, max_ndead=150)
        # sampling stops exactly at the cap; the final drain then retires
        # the nlive=100 remaining live points (nested_sampling.F90:381-384)
        assert out.ndead == 150 + 100


def test_resume_continues_under_turbo(tmp_path):
    """Checkpoint/resume with the chained path engaged: a run stopped at
    max_ndead resumes from its checkpoint and completes accurately (the
    device RNG stream continues from the checkpointed epoch_idx)."""
    out1 = run_turbo(
        tmp_path, write_resume=True, read_resume=True, max_ndead=400,
    )
    assert out1.ndead == 400 + 100
    out2 = run_turbo(
        tmp_path, write_resume=True, read_resume=True,
    )
    assert out2.ndead > 600
    assert abs(out2.logZ - ANALYTIC) < 3 * out2.logZerr + 0.25
