"""Native C administrator kernels must agree exactly with the numpy
fallbacks (and the build must degrade gracefully without a toolchain)."""

import numpy as np
import pytest

from polychordlite_tpu.ops.linalg import similarity_matrix_np
from polychordlite_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.has_native(), reason="native toolchain unavailable"
)


def test_similarity_matrix_matches():
    pts = np.random.default_rng(0).standard_normal((40, 5))
    c = native.similarity_matrix(pts)
    assert np.allclose(c, similarity_matrix_np(pts), atol=1e-12)


def test_compute_knn_matches_numpy():
    pts = np.random.default_rng(1).standard_normal((60, 3))
    sim = similarity_matrix_np(pts)
    k = 7
    c = native.compute_knn(sim, k)
    ref = np.argsort(sim, axis=1, kind="stable")[:, :k]
    # distances must agree even when ties reorder indices
    d_c = np.take_along_axis(sim, c, axis=1)
    d_ref = np.take_along_axis(sim, ref, axis=1)
    assert np.allclose(d_c, d_ref)
    assert np.all(c[:, 0] == np.arange(60))  # self is its own nearest


def test_mutual_knn_cluster_matches_blobs():
    rng = np.random.default_rng(2)
    pts = np.concatenate(
        [
            [0.0, 0.0] + 0.05 * rng.standard_normal((30, 2)),
            [5.0, 5.0] + 0.05 * rng.standard_normal((25, 2)),
        ]
    )
    sim = similarity_matrix_np(pts)
    knn = native.compute_knn(sim, 5)
    labels = native.mutual_knn_cluster(knn)
    assert labels is not None
    assert labels.max() + 1 == 2
    assert len(np.unique(labels[:30])) == 1
    assert len(np.unique(labels[30:])) == 1
    # first-appearance relabelling: first point has label 0
    assert labels[0] == 0


def test_identify_clusters_matches_bruteforce():
    rng = np.random.default_rng(3)
    live = rng.uniform(size=(50, 4))
    cluster_of_live = rng.integers(0, 3, 50)
    pts = rng.uniform(size=(20, 4))
    got = native.identify_clusters(pts, live, cluster_of_live)
    d = ((pts[:, None, :] - live[None, :, :]) ** 2).sum(-1)
    expect = cluster_of_live[np.argmin(d, axis=1)]
    assert np.array_equal(got, expect)
