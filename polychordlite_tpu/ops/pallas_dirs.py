"""Lane-batched Gram-Schmidt Pallas kernel — Haar bases at VPU speed.

``directions._gram_schmidt`` (the XLA path) orthonormalises 40 960 tiny
(20, 20) matrices per epoch at the bench geometry with ~84 small batched
einsums.  XLA lowers each as a batched matmul whose 20xk x 20xj operands
are padded to full MXU tiles — ~1-2 % utilisation — measured at **11.6 ms
of the 15.6 ms epoch** (66 %; experiments/prof_dirs_kernel.py, the
round-3 "dirs 6.5 ms" figure was polluted by the axon terminal's
result-memoisation of repeat-identical dispatches).

This kernel flips the layout: matrices arrive as ``(n_bases, dim, dim, B)``
with the *chain* axis minor, so every scalar entry (i, j) of the matrix is
a ``(SC, LANE)`` vector over chains and classical Gram-Schmidt runs as
pure elementwise VPU work — zero MXU padding, zero wasted lanes:

    for j in 0..dim-1:
        v = g[:, j]                       # (dim, SC, LANE)
        for sweep in 0..1:                # CGS2: two projection sweeps
            for k in 0..j-1:
                v -= sum(q_k * v, axis=0) * q_k
        q_j = v / max(|v|, 1e-30)

~3*dim*dim^2 vector ops per basis — ~1 ms/epoch at the bench geometry vs
11.6 ms for the einsum path (~23k vreg-ops per (SC*LANE)-chain block).

Same construction as the reference ``random_orthonormal_basis``
(``src/polychord/random_utils.F90:381-403``): Gram-Schmidt of a Gaussian
matrix = Haar-distributed orthonormal basis.  The input Gaussians are
identical to the XLA path's (same per-chain keys, same draw shapes); only
the projection-sweep order differs from the *blocked* CGS2 of
``_gram_schmidt`` (float-level, not distribution-level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SC = 8  # chains per sublane block; block VMEM = dim^2 * SC * LANE * 4


@functools.partial(jax.jit, static_argnames=("interpret",))
def gram_schmidt_lanes(gauss_t: jnp.ndarray, interpret: bool = False):
    """CGS2-orthonormalise the columns of a batch of small matrices.

    ``gauss_t``: (n_bases, dim, dim, B) f32, chain axis minor, B a
    multiple of SC*LANE.  Returns the same layout with orthonormal
    columns (indexed by axis 2).
    """
    NB, dim, dim2, B = gauss_t.shape
    assert dim == dim2 and B % (SC * LANE) == 0
    n_chunks = B // (SC * LANE)
    g5 = gauss_t.reshape(NB, dim, dim, n_chunks * SC, LANE)

    def kernel(g_ref, q_ref):
        for j in range(dim):
            v = g_ref[0, :, j]  # (dim, SC, LANE)
            for _ in range(2):  # CGS2
                for k in range(j):
                    qk = q_ref[0, :, k]
                    coeff = jnp.sum(qk * v, axis=0)
                    v = v - coeff[None] * qk
            norm = jnp.sqrt(jnp.sum(v * v, axis=0))
            q_ref[0, :, j] = v / jnp.maximum(norm, 1e-30)[None]

    out = pl.pallas_call(
        kernel,
        grid=(NB, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, dim, dim, SC, LANE), lambda nb, c: (nb, 0, 0, c, 0)
            )
        ],
        out_specs=pl.BlockSpec(
            (1, dim, dim, SC, LANE), lambda nb, c: (nb, 0, 0, c, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(g5.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(g5)
    return out.reshape(NB, dim, dim, B)
