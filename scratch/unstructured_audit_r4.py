"""Unstructured perf audit (VERDICT r3 item 4): bench-scale unstructured
run on the general (non-canvas) ELL path.

Problem: lshape.msh refined 4x -> 94,593 P1 dofs, 187,904 triangles,
RCB-partitioned into N_SUB subdomains, islands coefficient, two-level
GenEO-RAS, GMRES 1e-8 — the reference's default world (GmshReader +
ParMETIS, ddm_utilities.hh:33-171).

Records the setup/solve split (Logger phases + wall timings, warm second
attempt) so BASELINE.md can name the dominant general-path costs and pick
a lever.  Knobs:
  DDM_AUDIT_REFINE (default 4), DDM_AUDIT_NSUB (default 128),
  DDM_AUDIT_COARSE (default geneo), DDM_AUDIT_MAXIT (default 400).

Run: timeout 4800 python scratch/unstructured_audit_r4.py
(TPU; one process at a time — tunnel discipline.)
"""

import os
import time

import numpy as np

import ddm_tpu  # noqa: F401  (compile cache)
import jax
import jax.numpy as jnp

from ddm_tpu.api import build_preconditioner, default_ptree, setup_problem
from ddm_tpu.fem import problems as pm
from ddm_tpu.fem.grids import refine
from ddm_tpu.fem.msh import read_msh
from ddm_tpu.obs.logger import Logger
from ddm_tpu.solvers.krylov import gmres_solve, operator_of, prec_of


def log(msg):
    print(msg, flush=True)


def main():
    refine_n = int(os.environ.get("DDM_AUDIT_REFINE", "4"))
    n_sub = int(os.environ.get("DDM_AUDIT_NSUB", "128"))
    cs = os.environ.get("DDM_AUDIT_COARSE", "geneo")
    maxit = int(os.environ.get("DDM_AUDIT_MAXIT", "400"))
    nev = int(os.environ.get("DDM_AUDIT_NEV", "8"))

    t0 = time.perf_counter()
    grid = read_msh("/root/reference/data/lshape.msh")
    grid = refine(grid, refine_n)
    log(f"grid: {grid.n_nodes} nodes, {grid.n_elems} {grid.elem_type}s "
        f"({time.perf_counter() - t0:.1f}s host)")

    pt = default_ptree()
    pt["overlap"] = 2
    pt["coarsespace.type"] = cs
    pt[f"{cs}.eigensolver.nev"] = nev
    pt[f"{cs}.eigensolver.threshold"] = -1.0
    if os.environ.get("DDM_AUDIT_BENCHGRADE", "1") != "0":
        # the bench headline's preconditioner-grade inverse (measured
        # same-iteration at 2-D bench scale, BASELINE.md r3 knob sweep);
        # r5 audit baseline with the exact-grade default read factorise
        # 22.0 s of the 41.5 s warm setup
        pt["schwarz.subdomain_solver.newton_rtol"] = 4e-1
    for kv in filter(None, os.environ.get("DDM_AUDIT_SET", "").split(",")):
        k, _, v = kv.partition("=")
        for cast in (int, float, str):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        pt[k.strip()] = v

    t0 = time.perf_counter()
    p = setup_problem(pt, problem=pm.islands(), grid=grid, n_sub=n_sub)
    host_s = time.perf_counter() - t0
    log(f"setup_problem: {host_s:.1f}s; n={p.disc.n_dofs} n_sub={p.topo.n_sub} "
        f"n_pad={p.topo.n_pad} canvas={getattr(p.topo, 'rect', None) is not None}")

    if os.environ.get("DDM_AUDIT_BASELINE", "1") != "0":
        # download the CPU baseline's GEVP matrices NOW, while HBM is empty:
        # recomputing them after the TPU attempts OOMs (the backend's value-
        # memoization pins earlier attempts' buffers — bench.py r4 gotcha,
        # reproduced by this script's first r5 run)
        import sys
        sys.path.insert(0, "/root/repo")
        import bench

        bench._baseline_gevp_mats(p)

    prec = res = None
    for attempt in range(2):
        prec = res = None
        import gc
        gc.collect()
        t0 = time.perf_counter()
        prec = build_preconditioner(p)
        jax.block_until_ready(jax.tree_util.tree_leaves(prec))
        t_setup = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = gmres_solve(
            operator_of(p.A), prec_of(prec), p.rhs, jnp.zeros_like(p.rhs),
            reduction=1e-8, maxit=maxit, restart=50,
        )
        jax.block_until_ready(res.x)
        t_solve = time.perf_counter() - t0
        true_res = float(jnp.linalg.norm(p.A.mv(res.x) - p.rhs)
                         / jnp.linalg.norm(p.rhs))
        log(f"attempt {attempt}: setup {t_setup:.2f}s solve {t_solve:.2f}s "
            f"iters {int(res.iterations)} conv {bool(res.converged)} "
            f"true_rel_res {true_res:.2e}")

    # per-iteration cost: re-run at two maxit values on the SAME compiled
    # fn, each maxit measured twice (the first call at a new maxit pays a
    # retrace — the r5 baseline run read a negative slope from it)
    its = int(res.iterations)
    if its > 4:
        t_per = {}
        for m in (max(2, its // 4), its):
            for _ in range(2):
                t0 = time.perf_counter()
                r = gmres_solve(
                    operator_of(p.A), prec_of(prec), p.rhs,
                    jnp.zeros_like(p.rhs), reduction=0.0, maxit=m, restart=50,
                )
                jax.block_until_ready(r.x)
                t_per[m] = time.perf_counter() - t0
        ms = list(t_per)
        per_it = (t_per[ms[1]] - t_per[ms[0]]) / (ms[1] - ms[0])
        log(f"per-iteration: {per_it * 1e3:.1f} ms/iter "
            f"({ms[0]} its {t_per[ms[0]]:.2f}s, {ms[1]} its {t_per[ms[1]]:.2f}s)")

    log(Logger.get().report())

    if os.environ.get("DDM_AUDIT_BASELINE", "1") != "0":
        # the bench's sequential CPU reference-algorithm baseline is
        # problem-agnostic (operates on p) — reuse it for the unstructured
        # vs_baseline number
        import sys
        sys.path.insert(0, "/root/repo")
        import bench

        cpu = bench.run_cpu_baseline(p, nev)
        import json

        tpu_total = t_setup + t_solve
        cpu_total = cpu["setup"] + cpu["solve"]
        log(json.dumps({
            "metric": "poisson_islands_geneo_ras_lshape_unstructured_"
                      f"{p.disc.n_dofs}dofs_{n_sub}sub_setup_solve",
            "value": round(tpu_total, 4), "unit": "s",
            "vs_baseline": round(cpu_total / tpu_total, 3),
            "cpu_sequential_s": round(cpu_total, 2),
            "iters": int(res.iterations),
            "cpu_iters": cpu["iters"],
        }))


if __name__ == "__main__":
    main()
