"""SVD coarse space (coarse_spaces.hh:1268-1407).

Basis = first n left singular vectors of T = D * A_ii^{-1} * A_{i,Gamma}
(interior-restricted POU times the interior solve of boundary couplings).
The reference builds T column-by-column with UMFPACK solves and runs Eigen's
BDC-SVD per rank sequentially; here T forms as one batched masked solve and
``jnp.linalg.svd`` runs over the whole subdomain batch at once.

Config subtree ``svd_coarse_space``: ``n`` (default 10), ``mult_pou``
(default false — the U columns are orthonormal already).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.mesh import batched
import numpy as np

from ..config import ParamTree
from ..solvers.direct import factor_batched
from .basis import CoarseBasis, finalize_basis
from .extension import masked_operator
from .geneo import dirichlet_dense


def _svd_operator(p):
    """T = D * A_ii^{-1} * A_{i,Gamma} as one batched masked solve.
    Returns (T, interior_mask)."""
    topo = p.topo
    A_dir, dmask = dirichlet_dense(p)
    dmask_np = np.asarray(dmask)
    boundary = topo.valid & np.asarray(topo.boundary) & ~dmask_np
    interior = topo.valid & ~np.asarray(topo.boundary) & ~dmask_np
    im = batched(interior)
    bm = batched(boundary)

    Aib = jnp.where(im[:, :, None] & bm[:, None, :], A_dir, 0.0)
    fac = factor_batched(masked_operator(A_dir, im), "lu", mode="factors")
    T = jnp.where(im[:, :, None] & bm[:, None, :], fac.solve(Aib), 0.0)
    T = T * batched(p.pou)[:, :, None]  # D * T (interior rows)
    return T, im


def svd_coarse_space(p, ptree: ParamTree):
    topo = p.topo
    sub = ptree.sub("svd_coarse_space")
    nev = sub.get("n", 10)
    mult_pou = sub.get("mult_pou", False)

    T, im = _svd_operator(p)
    U, s, _ = jnp.linalg.svd(T, full_matrices=False)
    V = U[:, :, :nev].transpose(0, 2, 1)  # (n_sub, nev, p)
    V = jnp.where(im[:, None, :], V, 0.0)
    active = jnp.ones((topo.n_sub, nev), bool)
    if mult_pou:
        return finalize_basis(V, batched(p.pou), batched(topo.valid), active)
    return CoarseBasis(V=V, active=active)


def singular_values(p) -> np.ndarray:
    """Diagnostic: the singular-value spectra (reference writes them to
    singular_values_<rank>.txt, coarse_spaces.hh:1387-1391)."""
    T, _ = _svd_operator(p)
    return np.asarray(jnp.linalg.svd(T, compute_uv=False))
