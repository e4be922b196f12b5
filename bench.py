#!/usr/bin/env python
"""Benchmark: RAS-preconditioned GMRES on heterogeneous Poisson.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

value       = TPU wall-clock for preconditioner setup + Krylov solve
              (steady state: second run, compile excluded — the reference has
              no JIT either), f64.
vs_baseline = cpu_reference_seconds / tpu_seconds, where the baseline runs
              the *same algorithm the reference uses* on host CPU: per-
              subdomain sparse LU factorizations (scipy SuperLU, UMFPACK
              class) executed sequentially + GMRES(50) with sequential RAS
              applies via scipy.  This emulates the reference's single-node
              MPI CPU path (dune-ddm publishes no numbers of its own —
              BASELINE.md).

Config via env: DDM_BENCH_GRIDSIZE (default 192), DDM_BENCH_PARTS (default 4
-> 4x4 subdomains), DDM_BENCH_OVERLAP (default 2).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_problem(gridsize, parts, overlap):
    from ddm_tpu.api import default_ptree, setup_problem

    pt = default_ptree()
    pt["gridsize"] = gridsize
    pt["overlap"] = overlap
    pt["solver.reduction"] = 1e-8
    p = setup_problem(pt, parts=(parts, parts))
    from ddm_tpu.fem import problems as pm

    # heterogeneous islands coefficient (reference islands/Lua problem)
    pt2 = default_ptree()
    pt2["gridsize"] = gridsize
    pt2["overlap"] = overlap
    pt2["solver.reduction"] = 1e-8
    p = setup_problem(pt2, problem=pm.islands(), parts=(parts, parts))
    return p


def run_tpu(p):
    import jax
    import jax.numpy as jnp

    from ddm_tpu.core.indexmaps import extraction_map
    from ddm_tpu.precond.extract import extract_subdomain_dense
    from ddm_tpu.precond.schwarz import SchwarzPreconditioner
    from ddm_tpu.solvers.direct import factor_batched
    from ddm_tpu.solvers.krylov import gmres_solve, operator_of, prec_of

    local_cols = jnp.asarray(extraction_map(p.topo, np.asarray(p.A.cols)))
    sub2glob = jnp.asarray(p.topo.sub2glob)
    valid = jnp.asarray(p.topo.valid)
    pou = jnp.asarray(p.pou)

    @jax.jit
    def setup(ell):
        A_sub = extract_subdomain_dense(ell, sub2glob, valid, local_cols)
        return factor_batched(A_sub, "cholesky")

    def solve(ell, factors, b):
        prec = SchwarzPreconditioner(
            sub2glob=sub2glob, valid=valid, pou=pou, factors=factors
        )
        return gmres_solve(
            operator_of(ell), prec_of(prec), b, jnp.zeros_like(b),
            reduction=1e-8, maxit=400, restart=50,
        )

    timings = {}
    for attempt in range(2):  # first run compiles; report the second
        t0 = time.perf_counter()
        factors = setup(p.A)
        jax.block_until_ready(factors)
        t1 = time.perf_counter()
        res = solve(p.A, factors, p.rhs)
        jax.block_until_ready(res.x)
        t2 = time.perf_counter()
        timings = {"setup": t1 - t0, "solve": t2 - t1, "iters": int(res.iterations),
                   "converged": bool(res.converged)}
        log(f"tpu attempt {attempt}: {timings}")
    return timings


def run_cpu_baseline(p):
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla

    Asp = p.disc.pattern.to_scipy(p.A).tocsc()
    b = np.asarray(p.rhs)
    topo = p.topo
    n = Asp.shape[0]

    t0 = time.perf_counter()
    lus = []
    subids = []
    for k in range(topo.n_sub):
        ids = topo.sub2glob[k, topo.valid[k]].astype(np.int64)
        subids.append(ids)
        lus.append(spla.splu(Asp[ids][:, ids].tocsc()))
    t1 = time.perf_counter()

    pou_rows = [np.asarray(p.pou[k, topo.valid[k]]) for k in range(topo.n_sub)]

    def ras(d):
        x = np.zeros(n)
        for k in range(topo.n_sub):
            x[subids[k]] += pou_rows[k] * lus[k].solve(d[subids[k]])
        return x

    M = spla.LinearOperator((n, n), matvec=ras)
    it = [0]

    def cb(_):
        it[0] += 1

    x, info = spla.gmres(
        Asp, b, rtol=1e-8, atol=0.0, restart=50, maxiter=400, M=M,
        callback=cb, callback_type="pr_norm",
    )
    t2 = time.perf_counter()
    res = np.linalg.norm(b - Asp @ x) / np.linalg.norm(b)
    out = {"setup": t1 - t0, "solve": t2 - t1, "iters": it[0], "resid": res,
           "converged": info == 0}
    log(f"cpu baseline: {out}")
    return out


def main():
    gridsize = int(os.environ.get("DDM_BENCH_GRIDSIZE", "192"))
    parts = int(os.environ.get("DDM_BENCH_PARTS", "8"))
    overlap = int(os.environ.get("DDM_BENCH_OVERLAP", "2"))

    t0 = time.perf_counter()
    p = build_problem(gridsize, parts, overlap)
    log(f"host setup (grid+assembly+topology): {time.perf_counter()-t0:.3f}s; "
        f"n={p.disc.n_dofs} n_sub={p.topo.n_sub} n_pad={p.topo.n_pad}")

    tpu = run_tpu(p)
    cpu = run_cpu_baseline(p)

    tpu_total = tpu["setup"] + tpu["solve"]
    cpu_total = cpu["setup"] + cpu["solve"]
    print(
        json.dumps(
            {
                "metric": f"poisson_islands_ras_gmres_{gridsize}x{gridsize}_"
                          f"{parts * parts}sub_setup_solve",
                "value": round(tpu_total, 4),
                "unit": "s",
                "vs_baseline": round(cpu_total / tpu_total, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
