"""Round-5 3-D setup decomposition probe (VERDICT r4 items 2 + 8).

Rebuilds the 3-D bench problem (islands z-extruded, 56^3 hexes = 185,193
dofs, 8^3 = 512 subdomains, overlap 1, box canvas, chunk 24) and times the
dominant setup phases individually, warm (second call), then A/Bs the GEVP
pipeline variants the VERDICT asked to document:

  gevp-staged   : the production solve_gevp (staged whitener + subspace
                  seed + f64 refinement) — what the bench runs
  gevp-chol     : eigensolver.whiten=chol (classic f64 chol + blocked
                  tri-inv whitener)
  gevp-eigh     : seed_mode=eigh (full f32 eigh instead of the randomized
                  subspace seed)
  chunk 48      : DDM_TPU_BATCH_CHUNK=48 for the staged pipeline

Timing per CLAUDE.md rules: hard_sync (device-fetch) after every phase; the
FIRST timed case re-measured at the end.

Run: PYTHONPATH=/root/repo:/root/.axon_site DDM_TPU_BATCH_CHUNK=24 \
     timeout 5400 python scratch/setup3d_probe_r5.py
"""

import os
import time

os.environ.setdefault("DDM_TPU_BATCH_CHUNK", "24")

import numpy as np

import ddm_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from ddm_tpu.api import default_ptree, setup_problem
from ddm_tpu.fem import problems as pm
from ddm_tpu.fem.grids import structured_grid
from ddm_tpu.obs.logger import Logger, hard_sync


def log(msg):
    print(msg, flush=True)


GRID = int(os.environ.get("DDM_PROBE_GRID", "56"))
PARTS = int(os.environ.get("DDM_PROBE_PARTS", "8"))
NEV = 8

t0 = time.perf_counter()
pt = default_ptree()
pt["gridsize"] = GRID
pt["overlap"] = 1
pt["coarsespace.type"] = "geneo"
pt["geneo.eigensolver.nev"] = NEV
pt["schwarz.subdomain_solver.newton_rtol"] = 4e-1
grid = structured_grid((GRID,) * 3)
p = setup_problem(pt, problem=pm.islands(), grid=grid, parts=(PARTS,) * 3)
log(f"setup_problem {time.perf_counter() - t0:.1f}s  n={p.disc.n_dofs} "
    f"n_sub={p.topo.n_sub} n_pad={p.topo.n_pad} "
    f"canvas={type(getattr(p.topo, 'rect', None)).__name__}")

from ddm_tpu.coarse.geneo import neumann_matrices, scale_matrix_with_pou
from ddm_tpu.core.mesh import batched
from ddm_tpu.eigen import solve_gevp
from ddm_tpu.eigen.params import EigensolverParams
from ddm_tpu.solvers.direct import chunked_batch


def timed(name, fn, n=2):
    out = None
    for i in range(n):
        out = None  # release the previous attempt's batches (HBM: the
        import gc   # backend's value-memoization pins live outputs)
        gc.collect()
        t0 = time.perf_counter()
        out = fn()
        hard_sync(*jax.tree_util.tree_leaves(out))
        log(f"  {name:<28} attempt {i}: {time.perf_counter() - t0:.2f}s")
    return out


# -- phase 1: Neumann assembly (includes the canvas extraction inside) ------
AB = timed("neumann_matrices", lambda: neumann_matrices(p))
A_neu, B = AB
pou = batched(p.pou)
C = scale_matrix_with_pou(B, pou, donate=False)
hard_sync(C)
del AB, B

# -- phase 2: GEVP variants -------------------------------------------------
import dataclasses

base_params = EigensolverParams.from_ptree(pt.sub("geneo.eigensolver"))


def run_gevp(**over):
    params = dataclasses.replace(base_params, **over) if over else base_params
    return timed(
        f"gevp {over or 'staged(prod)'}",
        lambda: chunked_batch(
            lambda A_, C_: solve_gevp(A_, C_, params, spd=True),
            A_neu, C,
        ),
    )


lam0, V0, act0 = run_gevp()
lam1, V1, act1 = run_gevp(whiten="chol")
err = float(jnp.max(jnp.abs(lam0 - lam1) / (jnp.abs(lam1) + 1e-30)))
log(f"  staged-vs-chol lam rel diff: {err:.2e}")
run_gevp(seed_mode="eigh")

# chunk sweep for the production pipeline
for ch in (48,):
    os.environ["DDM_TPU_BATCH_CHUNK"] = str(ch)
    timed(f"gevp staged chunk={ch}",
          lambda: chunked_batch(
              lambda A_, C_: solve_gevp(A_, C_, base_params, spd=True),
              A_neu, C))
os.environ["DDM_TPU_BATCH_CHUNK"] = "24"

# -- phase 3: pairs coarse matrix ------------------------------------------
from ddm_tpu.coarse.basis import CoarseBasis
from ddm_tpu.precond.galerkin import galerkin_coarse_matrix_pairs
from ddm_tpu.precond.extract import extract_subdomain_dense

del A_neu, C  # HBM: phase 3's A_sub is another 4.1 GB batch

rect = getattr(p.topo, "rect", None)
A_sub = extract_subdomain_dense(
    p.A, batched(p.topo.sub2glob), batched(p.topo.valid), None, rect=rect,
)
hard_sync(A_sub)
V = V0 * batched(p.topo.valid)[:, None, :]
basis = CoarseBasis(V=V, active=act0)
timed("pairs coarse matrix",
      lambda: galerkin_coarse_matrix_pairs(A_sub, p.topo, basis))

# re-measure the first case (first-timed-variant trap)
timed("neumann_matrices (re)", lambda: neumann_matrices(p), n=1)

log(Logger.get().report())
