"""Two-level Schwarz orchestration.

The analogue of ``TwoLevelSchwarzPreconditioner``
(examples/pdelab_schwarz.hh:26-205): wires fine-level Schwarz + coarse space
+ Galerkin correction into one combined preconditioner, dispatching the
coarse space on ``coarsespace.type`` (SURVEY.md §5.6 key inventory).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ParamTree
from ..core.indexmaps import extraction_map
from .combined import CombinedPreconditioner, build_combined
from .extract import extract_subdomain_dense
from .galerkin import build_galerkin
from .schwarz import SchwarzPreconditioner, build_schwarz
from ..solvers.direct import factor_batched


def build_coarse_space(p, cs_type: str, ptree: ParamTree):
    """Dispatch like pdelab_schwarz.hh:93-141's coarse-space switch."""
    from ..coarse import pou_coarse_space

    if cs_type == "pou":
        templates = None
        if p.disc.n_comp > 1:
            from ..coarse.pou_space import rigid_body_modes

            templates = rigid_body_modes(p.disc.grid.nodes, p.disc.n_comp)
        return pou_coarse_space(
            p.topo, p.pou, templates=templates,
            dirichlet_mask=p.disc.dirichlet_mask,
        )
    if cs_type in ("geneo", "algebraic_geneo"):
        from ..coarse.geneo import geneo_coarse_space

        return geneo_coarse_space(p, ptree, algebraic=cs_type == "algebraic_geneo")
    if cs_type == "geneo_ring":
        from ..coarse.ring import geneo_ring_coarse_space

        return geneo_ring_coarse_space(p, ptree)
    if cs_type in ("msgfem", "algebraic_msgfem", "msgfem_euclid"):
        from ..coarse.msgfem import msgfem_coarse_space

        return msgfem_coarse_space(p, ptree, variant=cs_type)
    if cs_type == "msgfem_ring":
        from ..coarse.ring import msgfem_ring_coarse_space

        return msgfem_ring_coarse_space(p, ptree)
    if cs_type == "harmonic_extension":
        from ..coarse.harmonic import harmonic_extension_coarse_space

        return harmonic_extension_coarse_space(p, ptree)
    if cs_type == "svd":
        from ..coarse.svd import svd_coarse_space

        return svd_coarse_space(p, ptree)
    if cs_type == "constraint_geneo":
        from ..coarse.geneo import geneo_coarse_space

        return geneo_coarse_space(p, ptree, constrained=True)
    raise ValueError(f"Unknown coarse space type '{cs_type}'")


def sharded_two_level_step(
    ell, sub2glob, valid, local_cols, pou, A_neu, C_pou, b,
    *, nev: int, axis: str, reduction: float = 1e-8, maxit: int = 5,
):
    """FULL two-level GenEO setup + CG solve as the per-device body of a
    shard_map over the subdomain mesh axis: subdomain-batched arrays arrive
    as device-local blocks, the global operator/vectors replicated.

    Exercises every collective class the framework uses (SURVEY.md §2.6 /
    §5.8): local gathers, psum halo reductions on the fine level, all_gather
    of the coarse basis + coarse matrix, and the replicated coarse solve.
    Used by the driver's multi-chip dryrun (__graft_entry__) and the
    8-device parity tests (tests/test_multichip.py).
    """
    from ..coarse.basis import finalize_basis
    from ..eigen.dense_gevp import solve_gevp_dense
    from ..eigen.params import EigensolverParams
    from ..precond.extract import extract_subdomain_dense
    from ..precond.galerkin import (
        GalerkinPreconditioner,
        galerkin_coarse_matrix_sharded,
    )
    from ..solvers.direct import factor_batched
    from ..solvers.krylov import gmres_solve, operator_of, prec_of

    # fine level: local extraction + factorization
    A_sub = extract_subdomain_dense(ell, sub2glob, valid, local_cols)
    factors = factor_batched(A_sub, "cholesky", mode="inverse", refine_steps=0)
    fine = SchwarzPreconditioner(
        sub2glob=sub2glob, valid=valid, pou=pou, factors=factors, axis=axis
    )

    # GenEO eigensolve on the local subdomain batch
    params = EigensolverParams(nev=nev, threshold=-1.0, precision="f64")
    _, V_raw, active = solve_gevp_dense(A_neu, C_pou, params)
    basis = finalize_basis(V_raw, pou, valid, active)

    # replicated coarse matrix from the all-gathered basis + local columns
    E = galerkin_coarse_matrix_sharded(ell, sub2glob, basis, axis)
    coarse_fac = factor_batched(E[None], "cholesky", mode="inverse",
                                refine_steps=0)
    coarse = GalerkinPreconditioner(
        sub2glob=sub2glob, V=basis.V, active=basis.active, coarse=coarse_fac,
        axis=axis,
    )
    prec = CombinedPreconditioner(precs=(fine, coarse), mode="additive")
    # GMRES: the restricted (POU-weighted) fine level is nonsymmetric, as in
    # the reference's two-level driver default (twolevel_schwarz.hh:122-131)
    return gmres_solve(
        operator_of(ell), prec_of(prec), b, jnp.zeros_like(b),
        reduction=reduction, maxit=maxit, restart=min(50, max(maxit, 10)),
    )


def two_level_sharded_solve(p, mesh, nev: int = 2, axis: str = "sub",
                            reduction: float = 1e-8, maxit: int = 5):
    """Run the full sharded setup-and-solve step on DDMProblem ``p`` over
    ``mesh``.  Subdomain count must divide the mesh axis size."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from ..coarse.geneo import neumann_matrices
    from ..core.mesh import replicated_specs
    from ..fem.subassembly import scale_matrix_with_pou

    n_dev = mesh.shape[axis]
    if p.topo.n_sub % n_dev:
        raise ValueError(
            f"subdomain count {p.topo.n_sub} must divide the {n_dev}-device "
            f"mesh axis '{axis}'"
        )
    A_neu, B_neu = neumann_matrices(p)
    C_pou = scale_matrix_with_pou(B_neu, jnp.asarray(p.pou))
    local_cols = extraction_map(p.topo, np.asarray(p.A.colsT).T)

    body = partial(sharded_two_level_step, nev=nev, axis=axis,
                   reduction=reduction, maxit=maxit)
    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(replicated_specs(p.A), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    return fn(
        p.A,
        jnp.asarray(p.topo.sub2glob),
        jnp.asarray(p.topo.valid),
        jnp.asarray(local_cols),
        jnp.asarray(p.pou),
        A_neu,
        C_pou,
        p.rhs,
    )


def build_two_level(p, fine: SchwarzPreconditioner | None = None):
    """p: api.DDMProblem.  Returns the combined two-level preconditioner."""
    ptree = p.ptree
    cs_type = ptree.sub("coarsespace").get("type", "geneo")
    if fine is None:
        fine = build_schwarz(p.A, p.topo, p.pou, ptree)
    if cs_type == "none":
        return fine
    basis = build_coarse_space(p, cs_type, ptree)
    coarse_ptree = ptree if "coarse_solver.type" in ptree else None
    # every coarse space built here is POU-finalized (vanishes on subdomain
    # boundaries), so the pairwise-local coarse matrix is exact — and ~100x
    # the scan-of-SpMVs formulation on TPU (galerkin_coarse_matrix_pairs).
    # A coarse space without that invariant must clear basis.boundary_vanishing
    # and gets the always-exact global formula instead.
    method = ptree.sub("coarse_solver").get("matrix_method", "pairs")
    if method == "pairs" and not basis.boundary_vanishing:
        method = "global"
    coarse = build_galerkin(p.A, p.topo, basis, coarse_ptree, method=method)
    op = p.A if ptree.sub("combined_preconditioner").get("mode", "additive") == "multiplicative" else None
    return build_combined([fine, coarse], ptree, op=op)
