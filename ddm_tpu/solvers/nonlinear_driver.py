"""Nonlinear two-level Schwarz driver (reference: TwoLevelSchwarzSolver,
dune/ddm/twolevel_schwarz.hh:27-175, as used by examples/nonlinearpoisson.cc).

Reference behavior mirrored:
* first apply builds overlap comm + POU + coarse template vectors
  {1, x, y, xy} zeroed at constraints (twolevel_schwarz.hh:47-55, 68-98);
* later applies only re-add matrix values and refactorize (:99-104) — here:
  the topology, POU, extraction maps and coarse basis are built once; each
  Newton step re-extracts subdomain values (jitted, static shapes) and
  refactorizes;
* fine Schwarz + Galerkin coarse, additive or multiplicative per config;
* inner solver from the solver factory (bicgstab in the shipped ini).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import ParamTree
from ..core.indexmaps import extraction_map, pou_weights
from ..core.setup import setup_topology
from ..fem.nonlinear import NonlinearDiscretization
from ..precond.combined import CombinedPreconditioner
from ..precond.extract import extract_subdomain_dense
from ..precond.galerkin import build_galerkin
from ..precond.schwarz import SchwarzPreconditioner
from .direct import factor_batched
from .krylov import SOLVERS, operator_of, prec_of
from .newton import NewtonResult, newton_from_config


class TwoLevelNewtonSolver:
    def __init__(
        self,
        disc: NonlinearDiscretization,
        ptree: ParamTree,
        n_sub: int | None = None,
        parts: tuple | None = None,
    ):
        self.disc = disc
        self.ptree = ptree
        overlap = ptree.get("overlap", 2)
        self.topo, _ = setup_topology(disc, overlap=overlap, n_sub=n_sub, parts=parts)
        self.pou = pou_weights(
            self.topo,
            ptree.sub("pou").get("type", "distance"),
            shrink=ptree.sub("pou").get("shrink", 0),
        )
        self.sub2glob = jnp.asarray(self.topo.sub2glob)
        self.valid = jnp.asarray(self.topo.valid)
        self.pou_j = jnp.asarray(self.pou)
        self._local_cols = None  # built on first Jacobian (pattern-dependent)

        # coarse basis: POU space with templates {1, x, y, xy} zeroed at
        # constraints (twolevel_schwarz.hh:47-55)
        from ..coarse.pou_space import pou_coarse_space

        nodes = disc._node_coords  # includes P2 edge/center dofs
        x, y = nodes[:, 0], nodes[:, 1]
        templates = [np.ones(disc.n_dofs), x, y, x * y]
        self.basis = pou_coarse_space(
            self.topo, self.pou,
            templates=[jnp.asarray(t) for t in templates],
            dirichlet_mask=disc.dirichlet_mask,
        )
        self.schwarz_type = ptree.sub("schwarz").get("type", "restricted")
        self.sub_solver = ptree.sub("schwarz").sub("subdomain_solver").get(
            "type", "umfpack"
        )
        self.mode = ptree.sub("combined_preconditioner").get("mode", "multiplicative")
        stype = ptree.sub("solver").get("type", "bicgstabsolver")
        self.krylov = SOLVERS[stype]
        self.maxit = ptree.sub("solver").get("maxit", 1000)

    def _build_prec(self, J):
        if self._local_cols is None:
            self._local_cols = jnp.asarray(
                extraction_map(self.topo, np.asarray(J.colsT).T)
            )
        A_sub = extract_subdomain_dense(
            J, self.sub2glob, self.valid, self._local_cols,
            rect=getattr(self.topo, "rect", None),
        )
        factors = factor_batched(A_sub, self.sub_solver)
        pou = self.pou_j if self.schwarz_type == "restricted" else \
            jnp.ones_like(self.pou_j)
        fine = SchwarzPreconditioner(
            sub2glob=self.sub2glob, valid=self.valid, pou=pou, factors=factors
        )
        coarse = build_galerkin(
            J, self.topo, self.basis,
            self.ptree if "coarse_solver.type" in self.ptree else None,
        )
        op = J if self.mode == "multiplicative" else None
        return CombinedPreconditioner(precs=(fine, coarse), op=op, mode=self.mode)

    def solve(self, u0=None) -> NewtonResult:
        disc = self.disc
        u0 = u0 if u0 is not None else disc.initial_guess()

        def linear_solve(J, r, lin_red):
            prec = self._build_prec(J)
            res = self.krylov(
                operator_of(J), prec_of(prec), r, jnp.zeros_like(r),
                reduction=lin_red, maxit=self.maxit,
            )
            return res.x, int(res.iterations)

        return newton_from_config(disc.residual_jacobian, linear_solve, u0,
                                  self.ptree)
