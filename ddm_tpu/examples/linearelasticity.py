"""Linear elasticity example (reference: examples/linearelasticity.cc):
steel-reinforced rubber bar [0,10]x[0,1]x[0,1.5], clamped at x=0, GenEO
coarse space, GMRES to 1e-6."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from ..api import build_preconditioner, default_ptree, setup_problem, solve
from ..config import apply_cli_overrides, read_ini_file
from ..fem.grids import structured_grid
from ..fem.problems import steel_rubber_bar
from ..obs.logger import Logger, logger, scoped, setup_loggers


def main(argv=None):
    argv = setup_loggers(argv if argv is not None else sys.argv[1:])
    ptree = default_ptree()
    ptree["solver.reduction"] = 1e-6
    ptree["coarsespace.type"] = "geneo"
    ptree["coarse_solver.type"] = "lu"
    ptree["geneo.eigensolver.nev"] = 6
    ptree["cells_x"] = 20
    ptree["cells_y"] = 4
    ptree["cells_z"] = 6
    apply_cli_overrides(ptree, argv)
    ini = ptree.get("ini_file", "")
    if ini:
        read_ini_file(ini, ptree)
        apply_cli_overrides(ptree, argv)

    Logger.reset()
    with scoped("Driver", "Setup problem"):
        cells = (ptree.get("cells_x", 20), ptree.get("cells_y", 4),
                 ptree.get("cells_z", 6))
        grid = structured_grid(cells, (0, 0, 0), (10.0, 1.0, 1.5))
        # scripted coefficients (reference: coefficient.lua via LuaProblem)
        coeff_file = ptree.get("coefficient_file", "")
        if coeff_file:
            from ..fem.scripted import load_elasticity_problem

            problem = load_elasticity_problem(coeff_file)
        else:
            problem = steel_rubber_bar()
        p = setup_problem(ptree, problem=problem, grid=grid,
                          parts=(ptree.get("subdomains_x", 4), 1, 1),
                          n_comp=3)
        jax.block_until_ready(p.A.valsT)

    with scoped("Driver", "Setup preconditioner"):
        prec = build_preconditioner(p)
        jax.block_until_ready(jax.tree_util.tree_leaves(prec))

    with scoped("Driver", "Linear solve"):
        res = solve(p, prec)
        jax.block_until_ready(res.x)

    logger.info("Elasticity solve: {} iterations, converged {}",
                int(res.iterations), bool(res.converged))
    Logger.get().report(stream=sys.stderr)
    return p, res


if __name__ == "__main__":
    main()
