"""Poisson / convection-diffusion example driver.

Mirrors the reference's explicit pipeline (examples/poisson.cc:86-408):
grid -> partition -> assembly -> overlap topology -> POU -> fine Schwarz ->
coarse space -> Krylov solve -> VTK output -> timing report, with the same
phase event names ("Setup problem", "Setup preconditioner", "Linear solve",
"Total time", poisson.cc:171-174) and config keys.

Run:  python -m ddm_tpu.examples.poisson -ini_file cfg.ini [-key value ...]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..api import (
    build_preconditioner,
    default_ptree,
    setup_problem,
    solution,
    solve,
)
from ..config import ParamTree, apply_cli_overrides, read_ini_file
from ..fem import problems as pm
from ..obs.logger import Logger, logger, scoped, setup_loggers


def run(ptree: ParamTree, problem=None):
    Logger.reset()
    total = scoped("Total", "total time")
    Logger.get().start_event(total.event)

    with scoped("Driver", "Setup problem"):
        p = setup_problem(ptree, problem=problem)
        jax.block_until_ready(p.A.valsT)

    with scoped("Driver", "Setup preconditioner"):
        prec = build_preconditioner(p)
        jax.block_until_ready(jax.tree_util.tree_leaves(prec))

    with scoped("Driver", "Linear solve"):
        res = solve(p, prec)
        jax.block_until_ready(res.x)

    logger.info(
        "Solved in {} iterations (converged: {}), defect {} -> {}",
        int(res.iterations), bool(res.converged), float(res.defect0),
        float(res.defect),
    )

    if ptree.get("visualise", False):
        with scoped("Driver", "Visualisation"):
            visualise(p, res, ptree.get("vtk_filename", "poisson_out.vtu"))

    Logger.get().end_event(total.event)
    Logger.get().report(stream=sys.stderr)
    return p, res


def visualise(p, res, filename: str):
    """Solution + DDM debug fields (reference: poisson.cc:324-386)."""
    from ..fem.vtk import write_vtu

    u = solution(p, res)
    n = p.disc.n_dofs
    pou_sum = np.zeros(n + 1)
    np.add.at(pou_sum, p.topo.sub2glob, p.pou)
    owner = np.zeros(n + 1)
    np.add.at(owner, p.topo.sub2glob,
              p.topo.owner * (np.arange(p.topo.n_sub)[:, None] + 1.0))
    point_data = {
        "solution": np.asarray(u),
        "pou_sum": pou_sum[:n],
        "owner_subdomain": owner[:n] - 1,
    }
    cell_data = {"partition": np.asarray(p.elem_part, dtype=np.float64)}
    write_vtu(filename, p.disc.grid, point_data, cell_data)
    logger.info("Wrote {}", filename)


def main(argv=None):
    argv = setup_loggers(argv if argv is not None else sys.argv[1:])
    ptree = default_ptree()
    # defaults akin to examples/poisson.ini
    ptree["gridsize"] = 64
    ptree["subdomains"] = 16
    rest = apply_cli_overrides(ptree, argv)
    ini = ptree.get("ini_file", "")
    if ini:
        read_ini_file(ini, ptree)
        apply_cli_overrides(ptree, argv)  # CLI wins over ini
    coeff_file = ptree.get("coefficient_file", "")
    if coeff_file:
        from ..fem.scripted import load_problem

        problem = load_problem(coeff_file)
    else:
        problem_name = ptree.get("problem", "simple")
        problem = pm.PROBLEMS[problem_name]()
    run(ptree, problem)


if __name__ == "__main__":
    main()
