"""Convection-diffusion DG example (reference: examples/convectiondiffusiondg.cc).

Nonsymmetric Q1 SIPG system on a structured grid, solved with restricted
Schwarz + POU/GenEO coarse space in multiplicative mode via restarted GMRES
(convectiondiffusiondg.ini semantics).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..api import DDMProblem, build_preconditioner, default_ptree
from ..config import apply_cli_overrides, read_ini_file
from ..core.indexmaps import pou_weights
from ..core.setup import setup_topology
from ..fem import problems as pm
from ..fem.dg import DGDiscretization
from ..fem.grids import structured_grid
from ..obs.logger import Logger, logger, scoped, setup_loggers
from ..solvers.krylov import operator_of, prec_of, solve_from_config


def main(argv=None):
    argv = setup_loggers(argv if argv is not None else sys.argv[1:])
    ptree = default_ptree()
    ptree["gridsize"] = 32
    ptree["overlap"] = 1
    ptree["subdomains"] = 16
    ptree["combined_preconditioner.mode"] = "multiplicative"
    ptree["coarsespace.type"] = "geneo"
    ptree["coarse_solver.type"] = "lu"
    ptree["geneo.eigensolver.nev"] = 6
    # nonsymmetric system: LU/QR, not Cholesky (reference ini: umfpack)
    ptree["schwarz.subdomain_solver.type"] = "umfpack"
    ptree["pou.type"] = "standard"
    apply_cli_overrides(ptree, argv)
    ini = ptree.get("ini_file", "")
    if ini:
        read_ini_file(ini, ptree)
        apply_cli_overrides(ptree, argv)

    Logger.reset()
    with scoped("Driver", "Setup problem"):
        gs = ptree.get("gridsize", 32)
        grid = structured_grid((gs, gs))
        # scripted coefficients (reference:
        # convection_diffusion_coefficient.lua via LuaProblem)
        coeff_file = ptree.get("coefficient_file", "")
        if coeff_file:
            from ..fem.scripted import load_problem

            problem = load_problem(coeff_file)
        else:
            problem = pm.dg_heterogeneous()
        disc = DGDiscretization(grid, problem)
        A, b, g = disc.constrained_system()
        topo, elem_part = setup_topology(
            disc, overlap=ptree.get("overlap", 1),
            n_sub=ptree.get("subdomains", 16),
        )
        pou = pou_weights(topo, ptree.sub("pou").get("type", "standard"),
                          shrink=ptree.sub("pou").get("shrink", 0))
        p = DDMProblem(disc=disc, topo=topo, A=A, rhs=b, g=g, pou=pou,
                       ptree=ptree, elem_part=elem_part, scale=None)
        jax.block_until_ready(A.valsT)

    with scoped("Driver", "Setup preconditioner"):
        prec = build_preconditioner(p)
        jax.block_until_ready(jax.tree_util.tree_leaves(prec))

    with scoped("Driver", "Linear solve"):
        res = solve_from_config(operator_of(A), prec_of(prec), b,
                                jnp.zeros_like(b), ptree, "solver")
        jax.block_until_ready(res.x)

    logger.info("DG solve: {} iterations, converged {}",
                int(res.iterations), bool(res.converged))
    Logger.get().report(stream=sys.stderr)
    return p, res


if __name__ == "__main__":
    main()
