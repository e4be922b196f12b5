"""POU (Nicolaides-type) coarse space.

Reference: POUCoarseSpace (coarse_spaces.hh:1175-1231) — basis = partition of
unity times user template vectors (default: the constant-1 vector, the
classic Nicolaides coarse space), POU-finalized.  The Newton wrapper uses
templates {1, x, y, xy} zeroed at constraints (twolevel_schwarz.hh:47-55).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.mesh import batched
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
    T = jnp.stack([batched(t) for t in templates])  # (nev, n)
    if dirichlet_mask is not None:
        T = jnp.where(batched(dirichlet_mask)[None, :], 0.0, T)
    Tp = jnp.concatenate([T, jnp.zeros((nev, 1))], axis=1)
    V_raw = Tp[:, topo.sub2glob].transpose(1, 0, 2)  # (n_sub, nev, n_pad)
    valid = batched(topo.valid)
    active = jnp.ones((topo.n_sub, nev), bool)
    return finalize_basis(V_raw, batched(pou), valid, active)


def rigid_body_modes(nodes: np.ndarray, n_comp: int) -> list:
    """Global rigid-body-mode template vectors for elasticity coarse spaces
    (the near-kernel of the elastic operator): translations + rotations —
    3 modes in 2D, 6 in 3D.  Dof layout: node-major, component-minor."""
    import numpy as _np

    n, d = nodes.shape
    assert n_comp == d
    x = nodes

    def vec(field):
        return batched(_np.ascontiguousarray(field.reshape(-1)))

    modes = []
    for c in range(d):
        t = _np.zeros((n, d))
        t[:, c] = 1.0
        modes.append(vec(t))
    if d == 2:
        r = _np.stack([-x[:, 1], x[:, 0]], axis=1)
        modes.append(vec(r))
    else:
        r1 = _np.stack([-x[:, 1], x[:, 0], _np.zeros(n)], axis=1)
        r2 = _np.stack([-x[:, 2], _np.zeros(n), x[:, 0]], axis=1)
        r3 = _np.stack([_np.zeros(n), -x[:, 2], x[:, 1]], axis=1)
        modes += [vec(r1), vec(r2), vec(r3)]
    return modes
