"""Harmonic-extension coarse space (coarse_spaces.hh:1233-1266 +
pdelab_schwarz.hh:112-124): random boundary data, energy-minimally extended
into the subdomain interior, POU-finalized.

Config subtree ``coarse_space`` / ``harmonic_extension``: ``n_basis_vectors``
(default 8), ``seed``.  (The reference driver reads n_basis_vectors but then
allocates one vector per boundary dof — pdelab_schwarz.hh:117-121; the
intended n_basis_vectors semantics are used here.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.mesh import batched
import numpy as np

from ..config import ParamTree
from .basis import finalize_basis
from .extension import energy_minimal_extension
from .geneo import dirichlet_dense


def harmonic_extension_coarse_space(p, ptree: ParamTree):
    topo = p.topo
    sub = ptree.sub("harmonic_extension")
    nev = sub.get("n_basis_vectors", 8)
    seed = ptree.get("seed", 1)

    A_dir, dmask = dirichlet_dense(p)
    boundary = batched(topo.valid & np.asarray(topo.boundary))
    interior = batched(topo.valid) & ~boundary

    rng = np.random.default_rng(seed)
    data = batched(rng.normal(size=(topo.n_sub, nev, topo.n_pad)))
    data = jnp.where(boundary[:, None, :], data, 0.0)
    V = energy_minimal_extension(A_dir, interior, data)
    V = jnp.where(batched(topo.valid)[:, None, :], V, 0.0)
    active = jnp.ones((topo.n_sub, nev), bool)
    return finalize_basis(V, batched(p.pou), batched(topo.valid), active)
