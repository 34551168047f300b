"""Pallas slice-engine contract tests (interpret mode on the CPU mesh).

The pallas engine shares ``build_epoch_fn``'s packed contract with the
scan/ring engines and must produce babies with identical *structure*:
in-contour logL, identical direction streams, correct nlike accounting,
invalid-lane masking.  Its inner-loop uniforms are a different (counter-
based murmur) stream, so outputs are statistically — not bitwise —
equivalent to the scan engine (see ops/pallas_slice.py docstring); the
end-to-end oracle run checks the statistics.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polychordlite_tpu.ops.evaluate import make_batched_calculator
from polychordlite_tpu.ops.slice_kernel import (
    EpochConfig,
    build_epoch_fn,
    unpack_epoch,
)

D = 4
SIGMA = 0.2
NORM = -D * (math.log(SIGMA) + 0.5 * math.log(2 * math.pi))


def gaussian_like(theta):
    r2 = jnp.sum((theta - 0.5) ** 2)
    return NORM - 0.5 * r2 / SIGMA**2, [r2]


@pytest.fixture(scope="module")
def calc():
    return make_batched_calculator(lambda c: c, gaussian_like, D, n_derived=1)


def run_epoch(calc, engine, B=1024, R=4, seed=0, n_invalid=0):
    cfg = EpochConfig(
        n_dims=D, n_phi=1, grade_dims=(D,), num_repeats=(R,), engine=engine
    )
    epoch = build_epoch_fn(calc, cfg)
    key = jax.random.PRNGKey(seed)
    seeds = 0.5 + 0.05 * jax.random.normal(key, (B, D))
    r0 = 1.5 * SIGMA * math.sqrt(D)
    bound = jnp.full((B,), NORM - 0.5 * (r0 / SIGMA) ** 2, jnp.float32)
    chol = jnp.broadcast_to(SIGMA * jnp.eye(D, dtype=jnp.float32), (B, D, D))
    valid = jnp.arange(B) >= n_invalid
    packed = jax.jit(epoch)(key, seeds, bound, chol, valid)
    return unpack_epoch(packed, cfg), np.asarray(seeds), float(bound[0]), cfg


@pytest.mark.slow  # interpret-mode kernel sweeps, ~90 s total
class TestPallasEpoch:
    def test_babies_inside_contour(self, calc):
        (cube, theta, phi, logL, nlike), seeds, bound, cfg = run_epoch(
            calc, "pallas"
        )
        ok = logL > cfg.logzero
        assert ok.all()  # this contour is easy: no forced logzero accepts
        assert (logL[ok] >= bound - 1e-4).all()
        # theta re-derivation matches the prior transform (identity here)
        np.testing.assert_allclose(theta[ok], cube[ok], rtol=0, atol=1e-6)
        # derived parameter present
        r2 = ((theta - 0.5) ** 2).sum(axis=-1)
        np.testing.assert_allclose(phi[..., 0][ok], r2[ok], rtol=1e-4)

    def test_chains_move_every_repeat(self, calc):
        (cube, *_), seeds, _, _ = run_epoch(calc, "pallas")
        assert (np.abs(cube[:, 0] - seeds) > 0).any(axis=-1).all()
        moved = np.abs(np.diff(cube, axis=1)).sum(axis=-1)
        assert (moved > 0).all()

    def test_nlike_accounting(self, calc):
        (_, _, _, logL, nlike), *_ = run_epoch(calc, "pallas")
        B, R = logL.shape
        # every accepted baby costs >= 1 eval; INIT_R/INIT_L add more
        assert (nlike.sum(axis=1) >= 2 * R).all()
        assert nlike.shape == (B, 1)

    def test_invalid_lanes_masked(self, calc):
        (cube, theta, phi, logL, nlike), seeds, _, cfg = run_epoch(
            calc, "pallas", n_invalid=128
        )
        assert (logL[:128] == np.float64(np.float32(cfg.logzero))).all()
        np.testing.assert_allclose(
            cube[:128],
            np.broadcast_to(seeds[:128, None, :], cube[:128].shape),
            atol=1e-6,
        )
        assert (theta[:128] == 0).all() and (phi[:128] == 0).all()
        assert (nlike[:128] == 0).all()
        assert (logL[128:] > cfg.logzero).all()

    def test_same_direction_stream_as_scan(self, calc):
        """Engines share the direction/width streams: babies differ (inner
        uniforms differ) but both stay on chords through the same seeds."""
        (cube_p, *_), seeds, _, _ = run_epoch(calc, "pallas", R=1)
        (cube_s, *_), _, _, _ = run_epoch(calc, "scan", R=1)
        # first-repeat babies lie on the same line through the seed
        dp = cube_p[:, 0] - seeds
        ds = cube_s[:, 0] - seeds
        cross = np.linalg.norm(
            dp - (dp * ds).sum(-1, keepdims=True)
            / np.maximum((ds * ds).sum(-1, keepdims=True), 1e-30) * ds,
            axis=-1,
        )
        assert (cross < 1e-4).all()

    def test_statistics_match_scan(self, calc):
        """Mean/cov of accepted babies agree between engines (same chords,
        different uniforms -> same distribution)."""
        (cube_p, *_), *_ = run_epoch(calc, "pallas", B=2048, R=8)
        (cube_s, *_), *_ = run_epoch(calc, "scan", B=2048, R=8)
        last_p, last_s = cube_p[:, -1], cube_s[:, -1]
        # the engines share chords but draw different inner uniforms; at
        # B=2048 the per-coordinate mean sem is ~0.003, so 0.02 is ~6 sigma
        np.testing.assert_allclose(
            last_p.mean(axis=0), last_s.mean(axis=0), atol=0.02
        )
        np.testing.assert_allclose(
            last_p.std(axis=0), last_s.std(axis=0), rtol=0.1
        )


class TestPallasEndToEnd:
    def test_run_logZ_oracle(self, tmp_path):
        """2-D normalised Gaussian on U[0,1]^2 prior: logZ = 0 analytically
        (the quickstart oracle, BASELINE.md)."""
        import polychordlite_tpu

        sigma = 0.1
        norm = -2 * (math.log(sigma) + 0.5 * math.log(2 * math.pi))

        def like(theta):
            return norm - 0.5 * jnp.sum((theta - 0.5) ** 2) / sigma**2

        out = polychordlite_tpu.run(
            like,
            2,
            prior=lambda c: c,
            nlive=100,
            num_repeats=6,
            engine="pallas",
            read_resume=False,
            write_resume=False,
            do_clustering=False,
            base_dir=str(tmp_path),
            feedback=0,
            seed=3,
        )
        assert abs(out.logZ) < 2 * max(out.logZerr, 0.05) + 0.1

    def test_callback_model_falls_back_to_scan(self, tmp_path):
        """Non-traceable (host numpy) likelihood: engine='pallas' must
        degrade to the scan engine, not crash (parallel/mesh.py)."""
        import polychordlite_tpu

        def np_like(theta):
            t = np.asarray(theta)  # forces host evaluation
            return float(-0.5 * (t**2).sum() / 0.01), []

        out = polychordlite_tpu.run(
            np_like,
            2,
            prior=lambda c: 2 * c - 1,
            nlive=40,
            num_repeats=4,
            engine="pallas",
            max_ndead=150,
            read_resume=False,
            write_resume=False,
            do_clustering=False,
            base_dir=str(tmp_path),
            feedback=0,
            seed=5,
        )
        assert np.isfinite(out.logZ)


@pytest.mark.slow
class TestSpeculativeV5:
    """The v5 speculative-packet kernel must replay v4's sequential machine
    decision-exactly: accepted positions and eval counts bitwise, logL
    within float-graph noise (see ops/pallas_slice_v5.py docstring and
    experiments/check_v5.py for the full edge-case sweep)."""

    @pytest.mark.parametrize(
        "max_step,max_shrink,chol_scale,bound_off",
        [
            (100, 100, SIGMA, 0.0),      # typical contour
            (3, 100, 0.002, 0.0),        # step-out ladder capped
            (100, 2, 0.5, 5.0),          # forced (logzero) shrink accepts
        ],
    )
    def test_decision_exact_vs_v4(
        self, calc, max_step, max_shrink, chol_scale, bound_off
    ):
        from polychordlite_tpu.ops.pallas_slice_v4 import (
            build_epoch_fn_pallas_v4,
        )
        from polychordlite_tpu.ops.pallas_slice_v5 import (
            build_epoch_fn_pallas_v5,
        )

        B, R = 1024, 5  # minimum B: whole (8, 128) tiles
        cfg = EpochConfig(
            n_dims=D, n_phi=1, grade_dims=(D,), num_repeats=(R,),
            engine="pallas", max_step=max_step, max_shrink=max_shrink,
        )
        key = jax.random.PRNGKey(2)
        seeds = 0.5 + 0.05 * jax.random.normal(key, (B, D))
        r0 = 1.5 * SIGMA * math.sqrt(D)
        bound = jnp.full(
            (B,), NORM - 0.5 * (r0 / SIGMA) ** 2 + bound_off, jnp.float32
        )
        chol = jnp.broadcast_to(
            chol_scale * jnp.eye(D, dtype=jnp.float32), (B, D, D)
        )
        valid = jnp.ones((B,), bool).at[:100].set(False)
        p4 = np.asarray(
            jax.jit(build_epoch_fn_pallas_v4(calc, cfg))(
                key, seeds, bound, chol, valid
            )
        )
        p5 = np.asarray(
            jax.jit(build_epoch_fn_pallas_v5(calc, cfg))(
                key, seeds, bound, chol, valid
            )
        )
        stride = 2 * D + 1 + 1
        r4 = p4[:, : R * stride].reshape(B, R, stride)
        r5 = p5[:, : R * stride].reshape(B, R, stride)
        # positions + derived: bitwise; nlike tail: bitwise
        assert np.array_equal(r4[:, :, :-1], r5[:, :, :-1])
        assert np.array_equal(p4[:, R * stride:], p5[:, R * stride:])
        np.testing.assert_allclose(
            r4[:, :, -1], r5[:, :, -1], rtol=1e-5, atol=1e-3
        )

    def test_engine_dispatch_prefers_v4(self, calc):
        """engine='pallas' resolves to the fastest kernel that builds (v4,
        marginally ahead of v5 on chip — experiments/prof_v5_sc.py)."""
        from polychordlite_tpu.ops.slice_kernel import build_epoch_fn

        cfg = EpochConfig(
            n_dims=D, n_phi=1, grade_dims=(D,), num_repeats=(4,),
            engine="pallas",
        )
        fn = build_epoch_fn(calc, cfg)
        assert "pallas_slice_v4" in fn.__module__


class TestV5Smoke:
    """Fast-lane v5 coverage (VERDICT r4 item 8): the shipping
    engine='pallas5' surface builds and replays v4 decision-exactly on a
    small typical-contour epoch; the full edge-case sweep stays in the
    slow lane (TestSpeculativeV5)."""

    def test_small_decision_exact(self, calc):
        from polychordlite_tpu.ops.pallas_slice_v4 import (
            build_epoch_fn_pallas_v4,
        )
        from polychordlite_tpu.ops.pallas_slice_v5 import (
            build_epoch_fn_pallas_v5,
        )

        B, R = 1024, 2  # minimum B: whole (8, 128) tiles; R=2 keeps it fast
        cfg = EpochConfig(
            n_dims=D, n_phi=1, grade_dims=(D,), num_repeats=(R,),
            engine="pallas",
        )
        key = jax.random.PRNGKey(4)
        seeds = 0.5 + 0.05 * jax.random.normal(key, (B, D))
        r0 = 1.5 * SIGMA * math.sqrt(D)
        bound = jnp.full((B,), NORM - 0.5 * (r0 / SIGMA) ** 2, jnp.float32)
        chol = jnp.broadcast_to(
            SIGMA * jnp.eye(D, dtype=jnp.float32), (B, D, D)
        )
        valid = jnp.ones((B,), bool)
        p4 = np.asarray(
            jax.jit(build_epoch_fn_pallas_v4(calc, cfg))(
                key, seeds, bound, chol, valid
            )
        )
        p5 = np.asarray(
            jax.jit(build_epoch_fn_pallas_v5(calc, cfg))(
                key, seeds, bound, chol, valid
            )
        )
        stride = 2 * D + 1 + 1
        r4 = p4[:, : R * stride].reshape(B, R, stride)
        r5 = p5[:, : R * stride].reshape(B, R, stride)
        assert np.array_equal(r4[:, :, :-1], r5[:, :, :-1])
        assert np.array_equal(p4[:, R * stride:], p5[:, R * stride:])
