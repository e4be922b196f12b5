"""POU (Nicolaides-type) coarse space.

Reference: POUCoarseSpace (coarse_spaces.hh:1175-1231) — basis = partition of
unity times user template vectors (default: the constant-1 vector, the
classic Nicolaides coarse space), POU-finalized.  The Newton wrapper uses
templates {1, x, y, xy} zeroed at constraints (twolevel_schwarz.hh:47-55).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.indexmaps import DDMTopology
from .basis import CoarseBasis, finalize_basis


def pou_coarse_space(
    topo: DDMTopology,
    pou: np.ndarray,
    templates: list | None = None,
    dirichlet_mask=None,
) -> CoarseBasis:
    """templates: list of global (n,) vectors; default [ones].

    Template vectors are zeroed at Dirichlet dofs (reference:
    make_zero_at_dirichlet, examples/ddm_utilities.hh + twolevel_schwarz.hh:
    47-55) — coarse directions must live in the constrained space."""
    if templates is None:
        templates = [jnp.ones(topo.n_glob)]
    nev = len(templates)
    T = jnp.stack([jnp.asarray(t) for t in templates])  # (nev, n)
    if dirichlet_mask is not None:
        T = jnp.where(jnp.asarray(dirichlet_mask)[None, :], 0.0, T)
    Tp = jnp.concatenate([T, jnp.zeros((nev, 1))], axis=1)
    V_raw = Tp[:, topo.sub2glob].transpose(1, 0, 2)  # (n_sub, nev, n_pad)
    valid = jnp.asarray(topo.valid)
    active = jnp.ones((topo.n_sub, nev), bool)
    return finalize_basis(V_raw, jnp.asarray(pou), valid, active)
