"""Nonlinear Poisson example (reference: examples/nonlinearpoisson.cc):
-Δu + eta u² = |x|², Newton with two-level Schwarz inner BiCGStab solves and
setup reuse across Newton steps."""

from __future__ import annotations

import sys

import jax.numpy as jnp

from ..api import default_ptree
from ..config import apply_cli_overrides, read_ini_file
from ..fem.grids import structured_grid
from ..fem.nonlinear import NonlinearDiscretization, NonlinearProblem
from ..obs.logger import Logger, logger, scoped, setup_loggers
from ..solvers.nonlinear_driver import TwoLevelNewtonSolver


def main(argv=None):
    argv = setup_loggers(argv if argv is not None else sys.argv[1:])
    ptree = default_ptree()
    ptree["gridsize"] = 64
    ptree["subdomains"] = 16
    ptree["newton.Reduction"] = 1e-8
    ptree["solver.type"] = "bicgstabsolver"
    ptree["combined_preconditioner.mode"] = "multiplicative"
    ptree["coarse_solver.type"] = "lu"
    ptree["eta"] = 10.0
    apply_cli_overrides(ptree, argv)
    ini = ptree.get("ini_file", "")
    if ini:
        read_ini_file(ini, ptree)
        apply_cli_overrides(ptree, argv)

    Logger.reset()
    eta = ptree.get("eta", 10.0)
    nlp = NonlinearProblem(
        q=lambda u: eta * u * u, dq=lambda u: 2.0 * eta * u,
        f=lambda x: jnp.sum(x * x, axis=-1),
    )
    with scoped("Driver", "Setup problem"):
        gs = ptree.get("gridsize", 64)
        grid = structured_grid((gs, gs))
        disc = NonlinearDiscretization(grid, nlp)
        solver = TwoLevelNewtonSolver(disc, ptree,
                                      n_sub=ptree.get("subdomains", 16))

    with scoped("Driver", "Newton solve"):
        res = solver.solve()

    logger.info(
        "Newton: {} iterations (converged {}), {} total inner iterations, "
        "defect {} -> {}", res.iterations, res.converged,
        res.linear_iterations, res.defect0, res.defect,
    )
    Logger.get().report(stream=sys.stderr)
    return res


if __name__ == "__main__":
    main()
