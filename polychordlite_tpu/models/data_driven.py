"""Data-driven trans-dimensional example likelihoods.

Counterparts of the reference's ``fitting.f90`` (piecewise-linear function
fitting with x/y-uncertain data, 399 LoC) and ``object_detection.f90``
(gaussian blob detection in an image) — the two examples exercised with the
adaptive sorted priors.  Both are vectorised JAX: the object-detection
residual in particular is a dense (nx, ny) image computation per likelihood
call, which batches beautifully on the accelerator.

Data files use the reference formats: ``data.dat`` rows of
``x y sigma_x sigma_y``; ``obj_info.dat`` scalars nx/xmin/xmax/ny/ymin/ymax/
sigma; ``obj.dat`` ny rows of nx samples.  When no data directory is given, a
synthetic dataset with the same structure is generated.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf

LOG_TWO_PI = math.log(2.0 * math.pi)


# ----------------------------------------------------------------------
# fitting (fitting.f90)
# ----------------------------------------------------------------------


def _synthetic_fitting_data(n_stats: int = 40, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 2 * np.pi, n_stats)
    y = np.sin(x) + 0.2 * rng.standard_normal(n_stats)
    sigmax = np.full(n_stats, 2 * np.pi / 10)
    sigmay = np.full(n_stats, 0.2)
    return np.stack([x, y, sigmax, sigmay], axis=1), 0.0, 2 * np.pi


def load_fitting_data(data_dir: Optional[str] = None):
    """Read ``data.dat`` (+ optional ``data_min_max.dat``) in the reference
    format, or synthesise an equivalent dataset."""
    if data_dir is None:
        return _synthetic_fitting_data()
    data = np.loadtxt(os.path.join(data_dir, "data.dat"))
    mm_path = os.path.join(data_dir, "data_min_max.dat")
    if os.path.exists(mm_path):
        mm = np.loadtxt(mm_path)
        x_min, x_max = float(mm[0]), float(mm[1])
    else:
        x_min, x_max = float(data[:, 0].min()), float(data[:, 0].max())
    return data, x_min, x_max


def fitting(n_dims: int, data_dir: Optional[str] = None):
    """Piecewise-linear curve fitting with x- and y-uncertain data
    (fitting.f90:17-100): theta = [x-knots (n/2), y-knots (n/2)].

    For points with sigma_x <= 0 the likelihood is a plain Gaussian at the
    interpolated y; otherwise the x-uncertainty is integrated analytically
    over each linear segment via erf (log_exp_int, fitting.f90:48-88).
    """
    if n_dims % 2:
        raise ValueError("fitting likelihood needs an even nDims (x and y knots)")
    n_knots = n_dims // 2
    data, x_min, x_max = load_fitting_data(data_dir)
    x0 = jnp.asarray(data[:, 0])
    y0 = jnp.asarray(data[:, 1])
    sx = jnp.asarray(data[:, 2])
    sy = jnp.asarray(data[:, 3])
    has_sx = sx > 0.0
    logsqrtpiby2 = 0.5 * math.log(math.pi / 2.0)

    def loglikelihood(theta):
        xs = theta[:n_knots]
        ys = theta[n_knots:]

        # --- exact-x points: linear interpolation ---------------------
        idx = jnp.clip(jnp.searchsorted(xs, x0, side="right") - 1, 0, n_knots - 2)
        x1, x2 = xs[idx], xs[idx + 1]
        y1, y2 = ys[idx], ys[idx + 1]
        frac = jnp.where(x2 > x1, (x0 - x1) / jnp.where(x2 > x1, x2 - x1, 1.0), 0.0)
        y_int = y1 + jnp.clip(frac, 0.0, 1.0) * (y2 - y1)
        ll_exact = -jnp.log(sy) - 0.5 * LOG_TWO_PI - ((y_int - y0) / sy) ** 2 / 2.0

        # --- x-uncertain points: integrate over each segment ----------
        # segment slopes/intercepts (n_knots-1,)
        xa, xb = xs[:-1], xs[1:]
        m = (ys[1:] - ys[:-1]) / jnp.where(xb > xa, xb - xa, 1e-20)
        c = ys[:-1] - m * xa
        lo = jnp.clip(xa, x_min, x_max)
        hi = jnp.clip(xb, x_min, x_max)
        seg_ok = hi > lo

        # broadcast: points (P,1) vs segments (1,S)
        s = (1.0 / sx[:, None] ** 2 + m[None, :] ** 2 / sy[:, None] ** 2) ** -0.5
        e = x0[:, None] / sx[:, None] ** 2 + (y0[:, None] - c[None, :]) * m[
            None, :
        ] / sy[:, None] ** 2
        f = (
            x0[:, None] ** 2 / sx[:, None] ** 2
            + (y0[:, None] - c[None, :]) ** 2 / sy[:, None] ** 2
        )
        a_arg = (lo[None, :] - e * s**2) / (math.sqrt(2.0) * s)
        b_arg = (hi[None, :] - e * s**2) / (math.sqrt(2.0) * s)
        derf = jnp.maximum(erf(b_arg) - erf(a_arg), 1e-37)
        seg_log = (
            logsqrtpiby2
            + jnp.log(s)
            + jnp.log(derf)
            - f / 2.0
            + e**2 * s**2 / 2.0
        )
        seg_log = jnp.where(seg_ok[None, :], seg_log, -jnp.inf)
        log_int = jax_logsumexp(seg_log, axis=1)
        ll_intx = (
            log_int
            - jnp.log(sy)
            - jnp.log(jnp.abs(sx) + 1e-37)
            - LOG_TWO_PI
            - math.log(max(x_max - x_min, 1e-37))
        )

        return jnp.sum(jnp.where(has_sx, ll_intx, ll_exact))

    return loglikelihood


def jax_logsumexp(a, axis=None):
    amax = jnp.max(a, axis=axis, keepdims=True)
    amax_safe = jnp.where(jnp.isfinite(amax), amax, 0.0)
    out = jnp.log(jnp.sum(jnp.exp(a - amax_safe), axis=axis)) + jnp.squeeze(
        amax_safe, axis=axis
    )
    return out


# ----------------------------------------------------------------------
# object detection (object_detection.f90)
# ----------------------------------------------------------------------


def _synthetic_object_data(nx=20, ny=20, seed=0):
    rng = np.random.default_rng(seed)
    xg = np.linspace(0.0, 1.0, nx)
    yg = np.linspace(1.0, 0.0, ny)
    X, Y = np.meshgrid(xg, yg, indexing="ij")
    truth = [(1.0, 0.3, 0.7, 0.08), (0.7, 0.7, 0.3, 0.06)]
    img = sum(
        A * np.exp(-((X - x) ** 2 + (Y - y) ** 2) / (2 * R * R))
        for A, x, y, R in truth
    )
    sigma = 0.2
    img = img + sigma * rng.standard_normal((nx, ny))
    return img, xg, yg, sigma


def load_object_data(data_dir: Optional[str] = None):
    """Read ``obj_info.dat`` + ``obj.dat`` in the reference format, or
    synthesise an equivalent image."""
    if data_dir is None:
        return _synthetic_object_data()
    info = []
    with open(os.path.join(data_dir, "obj_info.dat")) as f:
        for line in f:
            info.append(float(line.split()[0]))
    nx, xmin, xmax, ny, ymin, ymax, sigma = info[:7]
    nx, ny = int(nx), int(ny)
    raw = np.loadtxt(os.path.join(data_dir, "obj.dat"))
    # file rows = y; crop to (ny, nx) — the reference's list-directed read
    # takes the first nx values of each of the first ny records (its own
    # obj.dat is 22x22 against a declared 20x20)
    img = raw[:ny, :nx].T  # -> (nx, ny)
    xg = np.linspace(xmin, xmax, nx)
    yg = np.linspace(ymax, ymin, ny)  # descending, as in the reference grid
    return img, xg, yg, sigma


def object_detection(n_dims: int, data_dir: Optional[str] = None):
    """Detect N = nDims/4 gaussian blobs in an image
    (object_detection.f90:7-34): theta packs [A, x, y, R] per object; the
    likelihood is the pixel-wise gaussian residual — a dense (nx, ny)
    computation that vectorises across the chain batch."""
    if n_dims % 4:
        raise ValueError("object_detection needs nDims divisible by 4")
    n_obj = n_dims // 4
    img, xg, yg, sigma = load_object_data(data_dir)
    nx, ny = img.shape
    img_j = jnp.asarray(img)
    X = jnp.asarray(np.meshgrid(xg, yg, indexing="ij")[0])
    Y = jnp.asarray(np.meshgrid(xg, yg, indexing="ij")[1])
    norm = -0.5 * nx * ny * math.log(2 * math.pi * sigma * sigma)

    def loglikelihood(theta):
        pars = theta.reshape(n_obj, 4)
        A = pars[:, 0][:, None, None]
        x = pars[:, 1][:, None, None]
        y = pars[:, 2][:, None, None]
        R = jnp.abs(pars[:, 3])[:, None, None] + 1e-30
        signal = jnp.sum(
            A * jnp.exp(-((X[None] - x) ** 2 + (Y[None] - y) ** 2) / (2 * R * R)),
            axis=0,
        )
        return -jnp.sum((img_j - signal) ** 2) / (2 * sigma * sigma) + norm

    return loglikelihood
