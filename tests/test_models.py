"""Likelihood-zoo checks: every example evaluates and traces; normalisation
spot checks against the reference formulae."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polychordlite_tpu.models import LIKELIHOODS, get_likelihood


DIMS = {
    "himmelblau": 2,
    "object_detection": 8,
    "fitting": 6,
    "rosenbrock": 4,
}


@pytest.mark.parametrize("name", sorted(LIKELIHOODS))
def test_evaluates_and_traces(name):
    nD = DIMS.get(name, 4)
    like = get_likelihood(name, nD)
    # distinct increasing values: the fitting likelihood needs non-degenerate
    # x-knots (equal knots are a zero-measure unphysical configuration)
    theta = jnp.linspace(0.2, 0.8, nD)
    out = like(theta)
    logL = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(float(logL))
    # must be vmappable (the engine's batching contract)
    batch = jnp.stack([theta, theta + 0.01])
    outs = jax.vmap(lambda t: like(t)[0] if isinstance(like(t), tuple) else like(t))(
        batch
    )
    assert outs.shape == (2,)


def test_gaussian_normalisation():
    # peak value = product of 1/(sigma sqrt(2pi)) at the mean
    like = get_likelihood("gaussian", 3)
    logL, phi = like(jnp.full((3,), 0.5))
    expect = -3 * (math.log(0.1) + 0.5 * math.log(2 * math.pi))
    assert np.isclose(float(logL), expect, atol=1e-5)


def test_gaussian_shells_symmetric():
    like = get_likelihood("gaussian_shells", 2)
    a = float(like(jnp.array([-3.5 + 2.0, 0.0])))
    b = float(like(jnp.array([3.5 - 2.0, 0.0])))
    assert np.isclose(a, b, rtol=1e-5)


def test_eggbox_value():
    like = get_likelihood("eggbox", 2)
    v = float(like(jnp.zeros(2)))
    assert np.isclose(v, -(2.0 + 1.0) ** 5, atol=1e-4)


def test_rastrigin_maximum_at_origin():
    like = get_likelihood("rastrigin", 2)
    v0 = float(like(jnp.zeros(2)))
    v1 = float(like(jnp.full(2, 0.5)))
    assert v0 > v1


def test_object_detection_prefers_truth():
    like = get_likelihood("object_detection", 8)
    truth = jnp.array([1.0, 0.3, 0.7, 0.08, 0.7, 0.7, 0.3, 0.06])
    wrong = jnp.array([1.0, 0.9, 0.1, 0.08, 0.7, 0.1, 0.9, 0.06])
    assert float(like(truth)) > float(like(wrong))


def test_fitting_prefers_good_curve():
    like = get_likelihood("fitting", 6)
    # knots following the synthetic sin(x) data vs a flat wrong line
    good = jnp.array([0.0, math.pi, 2 * math.pi, 0.0, 0.0, 0.0])
    bad = jnp.array([0.0, math.pi, 2 * math.pi, 5.0, 5.0, 5.0])
    assert float(like(good)) > float(like(bad))


def test_reference_data_files_load():
    """The reference's own data files parse through our loaders."""
    import os

    ref = "/root/reference/data"
    if not os.path.isdir(ref):
        pytest.skip("reference data not mounted")
    from polychordlite_tpu.models.data_driven import load_object_data

    img, xg, yg, sigma = load_object_data(ref)
    assert img.shape == (20, 20)
    assert sigma > 0
    like = get_likelihood("object_detection", 4, data_dir=ref)
    assert np.isfinite(float(like(jnp.array([0.5, 0.5, 0.5, 0.1]))))


def test_empty_derived_list_stays_traced():
    """`return logL, []` with nDerived=0 must take the traced path: the
    internal phi slot is padded to width 1, and an empty derived return
    used to fail the reshape inside the traceability probe, silently
    demoting the model to the ~50x slower host-callback path."""
    import jax.numpy as jnp

    from polychordlite_tpu.ops.evaluate import make_batched_calculator

    def lik(theta):
        return -jnp.sum(theta**2), []

    calc = make_batched_calculator(lambda c: c, lik, 3, n_derived=0)
    assert not calc.uses_callback


def test_quickstart_notebook_executes(tmp_path, monkeypatch):
    """The shipped quickstart notebook's code cells run end-to-end (the
    reference ships quickstart.ipynb; §2.4 parity).  Executed on CPU with a
    reduced nlive for speed."""
    import json
    import os

    nb = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "examples",
                          "quickstart.ipynb"))
    )
    src = "\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    )
    src = src.replace("nlive=200", "nlive=60").replace(
        'read_resume=False,', 'read_resume=False,\n    max_ndead=400,'
    )
    monkeypatch.chdir(tmp_path)
    exec(compile(src, "quickstart.ipynb", "exec"), {})
    assert (tmp_path / "chains" / "gaussian.stats").exists()
    assert (tmp_path / "posterior.png").exists() or (
        tmp_path / "posterior.pdf"
    ).exists()
