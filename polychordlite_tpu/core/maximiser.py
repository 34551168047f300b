"""Post-run maximisation (reference ``src/polychord/maximiser.F90`` +
``nelder_mead.f90``).

Finds the maximum-likelihood and maximum-posterior points starting from a
simplex of the nDims+1 best live points, running Nelder-Mead in hypercube
coordinates (maximiser.F90:33-87,138-156).  The posterior mode adds the
log-Jacobian of the prior transform, estimated by central finite differences
(dXdtheta, maximiser.F90:190-224).  Results go to ``<root>.maximum``.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..settings import PolyChordSettings
from ..utils.io import write_max_file
from .rti import RunTimeInfo


def _eval_point(calc, s: PolyChordSettings, cube: np.ndarray) -> np.ndarray:
    """Evaluate a single hypercube point into a full point record."""
    theta, phi, logL = calc(jnp.asarray(cube[None], dtype=jnp.float32))
    pt = np.zeros(s.nTotal)
    pt[s.h] = cube
    pt[s.p] = np.asarray(theta[0], dtype=np.float64)
    if s.nDerived:
        pt[s.d] = np.asarray(phi[0], dtype=np.float64)[: s.nDerived]
    pt[s.b0] = s.logzero
    pt[s.l0] = float(logL[0])
    return pt


def _nelder_mead(f, simplex: np.ndarray, max_iter: int = 2000, tol: float = 1e-9):
    """Minimise f over the simplex (nelder_mead.f90:7-80: standard
    reflection/expansion/contraction/shrink with a simplex-size stop)."""
    n = simplex.shape[1]
    vals = np.array([f(x) for x in simplex])
    for _ in range(max_iter):
        order = np.argsort(vals)
        simplex, vals = simplex[order], vals[order]
        if np.max(np.abs(simplex[1:] - simplex[0])) < tol:
            break
        centroid = simplex[:-1].mean(axis=0)
        xr = centroid + (centroid - simplex[-1])
        fr = f(xr)
        if fr < vals[0]:
            xe = centroid + 2.0 * (centroid - simplex[-1])
            fe = f(xe)
            if fe < fr:
                simplex[-1], vals[-1] = xe, fe
            else:
                simplex[-1], vals[-1] = xr, fr
        elif fr < vals[-2]:
            simplex[-1], vals[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)
            fc = f(xc)
            if fc < vals[-1]:
                simplex[-1], vals[-1] = xc, fc
            else:
                simplex = simplex[0] + 0.5 * (simplex - simplex[0])
                vals = np.array([f(x) for x in simplex])
    order = np.argsort(vals)
    return simplex[order][0], vals[order][0]


def _dXdtheta(calc, s: PolyChordSettings, cube: np.ndarray, eps: float = 1e-5):
    """log |d theta / d cube| by central finite differences of the prior
    transform (maximiser.F90:190-224); returns its negation's log-det so that
    logP = logL - log|dtheta/dcube| (posterior density in physical space)."""
    jac = np.zeros((s.nDims, s.nDims))
    for j in range(s.nDims):
        up = cube.copy()
        dn = cube.copy()
        up[j] = min(up[j] + eps, 1.0 - 1e-12)
        dn[j] = max(dn[j] - eps, 1e-12)
        pu = _eval_point(calc, s, up)[s.p]
        pd = _eval_point(calc, s, dn)[s.p]
        jac[:, j] = (pu - pd) / (up[j] - dn[j])
    sign, logdet = np.linalg.slogdet(jac)
    if not np.isfinite(logdet):
        return 0.0
    return -logdet


def maximise(calc, s: PolyChordSettings, rti: RunTimeInfo) -> None:
    """Find max-likelihood and max-posterior points and write ``.maximum``
    (maximise, maximiser.F90:33-87)."""
    live = rti.all_live()
    if live.shape[0] < s.nDims + 1:
        return
    order = np.argsort(-live[:, s.l0])
    simplex0 = live[order[: s.nDims + 1], s.h].copy()

    def neg_logL(cube):
        if np.any(cube < 0) or np.any(cube > 1):
            return -s.logzero  # huge
        return -_eval_point(calc, s, cube)[s.l0]

    best_cube, _ = _nelder_mead(neg_logL, simplex0.copy())
    max_point = _eval_point(calc, s, best_cube)

    dX = _dXdtheta(calc, s, best_cube)

    def neg_logP(cube):
        if np.any(cube < 0) or np.any(cube > 1):
            return -s.logzero
        return -(_eval_point(calc, s, cube)[s.l0] + _dXdtheta(calc, s, cube))

    best_post_cube, _ = _nelder_mead(neg_logP, simplex0.copy(), max_iter=400)
    max_post_point = _eval_point(calc, s, best_post_cube)
    dX_post = _dXdtheta(calc, s, best_post_cube)

    write_max_file(s, max_point, max_post_point, dX_post)
