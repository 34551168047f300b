"""The shipped ini/ suite parses and resolves to runnable configurations
(the reference ships ini/*.ini for every example likelihood)."""

import glob
import os

import pytest

from polychordlite_tpu.models import LIKELIHOODS
from polychordlite_tpu.utils.inifile import read_ini

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIS = sorted(glob.glob(os.path.join(REPO, "ini", "*.ini")))


def test_suite_is_nonempty():
    assert len(INIS) >= 10


# user-template inis (reference ini/my_likelihood.ini, ini/gaussian_CC.ini):
# their likelihood is user C/C++ code, not the Python zoo — parse-only
TEMPLATES = {"my_likelihood", "gaussian_CC"}


@pytest.mark.parametrize("path", INIS, ids=[os.path.basename(p) for p in INIS])
def test_ini_parses_and_matches_zoo(path):
    settings, blocks, paramnames, derived, kv = read_ini(path)
    assert settings.nDims >= 1
    assert settings.nlive > 0
    if settings.file_root not in TEMPLATES:
        assert settings.file_root in LIKELIHOODS  # CLI resolves the likelihood
    assert len(paramnames) == settings.nDims


def test_cli_smoke(tmp_path):
    """One tiny end-to-end CLI run from a shipped ini (overridden to be
    fast via a copy with a small budget)."""
    import subprocess
    import sys

    src = open(os.path.join(REPO, "ini", "gaussian_shells.ini")).read()
    src = (
        src.replace("nlive = 500", "nlive = 50")
        .replace("num_repeats = 10", "num_repeats = 4")
        .replace("base_dir = chains", f"base_dir = {tmp_path}")
        .replace("feedback = 1", "feedback = 0\nmax_ndead = 300\nseed = 2")
    )
    ini = tmp_path / "shells.ini"
    ini.write_text(src)
    (tmp_path / "clusters").mkdir()
    out = subprocess.run(
        [sys.executable, "-m", "polychordlite_tpu", str(ini)],
        capture_output=True,
        text=True,
        timeout=500,
        cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "logZ" in out.stdout
    assert (tmp_path / "gaussian_shells.stats").exists()


@pytest.mark.parametrize("name", ["fitting", "object_detection"])
def test_data_driven_ini_runs(tmp_path, name):
    """The two data-driven trans-dimensional examples run end-to-end from
    their shipped inis against the vendored reference data/ files
    (reference ini/fitting.ini, ini/object_detection.ini)."""
    import math

    from polychordlite_tpu.inidriver import run_ini

    src = open(os.path.join(REPO, "ini", f"{name}.ini")).read()
    src = (
        src.replace("nlive = 500", "nlive = 40")
        .replace("nlive = 50", "nlive = 40")
        .replace("base_dir = chains", f"base_dir = {tmp_path}")
        .replace("feedback = 1", "feedback = -1\nmax_ndead = 120\nseed = 3")
        .replace("data_dir = data", f"data_dir = {os.path.join(REPO, 'data')}")
    )
    ini = tmp_path / f"{name}.ini"
    ini.write_text(src)
    out = run_ini(str(ini))
    assert out["ndead"] > 0
    assert math.isfinite(out["logZ"])
    assert (tmp_path / f"{name}_phys_live.txt").exists()
