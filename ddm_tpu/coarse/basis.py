"""Coarse-space basis container and finalization.

The analogue of ``CoarseSpaceBuilder`` (reference:
dune/ddm/coarsespaces/coarse_spaces.hh:219-256): every coarse space produces
per-subdomain basis vectors.  Here they live as one padded batch
``V[n_sub, nev_max, n_pad]`` in subdomain-local coordinates with an
``active`` mask — the fixed-shape representation of the reference's ragged
``std::vector<BlockVector>`` per rank (adaptive eigenvalue thresholds make
nev differ per subdomain; masking replaces raggedness under SPMD).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class CoarseBasis:
    V: jnp.ndarray  # (n_sub, nev_max, n_pad), zero rows where inactive
    active: jnp.ndarray  # (n_sub, nev_max) bool
    # True iff every basis vector vanishes on its subdomain's boundary layer
    # (POU-finalized or interior-masked).  The pairwise-local Galerkin
    # coarse-matrix formula (precond/galerkin.py, method='pairs') is exact
    # ONLY under this invariant; build_two_level falls back to the global
    # formula when a coarse space clears the flag.
    boundary_vanishing: bool = field(default=True, metadata=dict(static=True))

    @property
    def n_sub(self):
        return self.V.shape[0]

    @property
    def nev_max(self):
        return self.V.shape[1]


def finalize_basis(
    V_raw: jnp.ndarray, pou: jnp.ndarray, valid: jnp.ndarray, active: jnp.ndarray
) -> CoarseBasis:
    """POU-scale and 2-norm-normalize basis vectors
    (reference: detail::finalize_eigenvectors, coarse_spaces.hh:52-61).

    POU scaling also zeroes the vectors on subdomain boundaries, which is
    what makes the locally-computed Galerkin coarse matrix exact
    (see precond/galerkin.py).
    """
    V = V_raw * pou[:, None, :] * valid[:, None, :]
    norms = jnp.sqrt(jnp.sum(V * V, axis=2, keepdims=True))
    # drop vectors that collapsed to (near-)zero — e.g. ConstraintGenEO's
    # harmonic correction of an island-interior mode with zero boundary
    # trace extends to the zero vector; keeping it active makes the coarse
    # matrix exactly singular (LU -> NaN).  1e-10 of the subdomain's
    # largest vector is far below any meaningful coarse direction.
    floor = 1e-10 * jnp.max(norms[:, :, 0], axis=1, keepdims=True)
    active = active & (norms[:, :, 0] > jnp.maximum(floor, 1e-300))
    V = jnp.where(active[:, :, None], V / jnp.maximum(norms, 1e-300), 0.0)
    return CoarseBasis(V=V, active=active)
