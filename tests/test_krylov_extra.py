"""FGMRES + mixed-precision apply machinery."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse.linalg as spla

from ddm_tpu.config import ParamTree
from ddm_tpu.core.indexmaps import pou_weights, extraction_map
from ddm_tpu.core.setup import setup_topology
from ddm_tpu.fem import structured_grid
from ddm_tpu.fem.discretize import Discretization
from ddm_tpu.fem import problems as prob
from ddm_tpu.precond.extract import extract_subdomain_dense
from ddm_tpu.precond.schwarz import build_schwarz
from ddm_tpu.solvers.direct import SparseRefinedInverse, factor_batched
from ddm_tpu.solvers.krylov import (
    fgmres_solve,
    gmres_solve,
    operator_of,
    prec_of,
    solve_from_config,
)


def setup(cells=(24, 24)):
    grid = structured_grid(cells)
    disc = Discretization(grid, prob.islands())
    A, rhs, g = disc.constrained_system()
    topo, _ = setup_topology(disc, overlap=2, parts=(2, 2))
    pou = pou_weights(topo, "distance")
    return disc, A, rhs, topo, pou


def test_fgmres_matches_gmres_iterations():
    disc, A, rhs, topo, pou = setup()
    pt = ParamTree({"schwarz": {"subdomain_solver": {"type": "cholesky"}}})
    P = build_schwarz(A, topo, pou, pt)
    r1 = gmres_solve(operator_of(A), prec_of(P), rhs, jnp.zeros_like(rhs),
                     reduction=1e-8, maxit=300, restart=50)
    r2 = fgmres_solve(operator_of(A), prec_of(P), rhs, jnp.zeros_like(rhs),
                      reduction=1e-8, maxit=300, restart=50)
    assert bool(r1.converged) and bool(r2.converged)
    # right-preconditioned counts differ slightly from left; both small
    assert abs(int(r1.iterations) - int(r2.iterations)) <= 10
    x_ref = spla.spsolve(disc.pattern.to_scipy(A).tocsc(), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(r2.x), x_ref,
                               atol=1e-6 * np.abs(x_ref).max())


def test_fgmres_true_residual_semantics():
    """FGMRES defect history is the TRUE residual (unpreconditioned)."""
    disc, A, rhs, topo, pou = setup(cells=(16, 16))
    pt = ParamTree({"schwarz": {"subdomain_solver": {"type": "cholesky"}}})
    P = build_schwarz(A, topo, pou, pt)
    r = fgmres_solve(operator_of(A), prec_of(P), rhs, jnp.zeros_like(rhs),
                     reduction=1e-8, maxit=300, restart=50)
    true_res = float(jnp.linalg.norm(rhs - A.mv(r.x)))
    assert abs(true_res - float(r.defect)) < 0.5 * float(r.defect) + 1e-12


def test_fgmres_in_solver_factory():
    disc, A, rhs, topo, pou = setup(cells=(16, 16))
    pt = ParamTree({
        "schwarz": {"subdomain_solver": {"type": "cholesky"}},
        "solver": {"type": "restartedflexiblegmressolver",
                   "reduction": 1e-8, "restart": 30},
    })
    P = build_schwarz(A, topo, pou, pt)
    r = solve_from_config(operator_of(A), prec_of(P), rhs,
                          jnp.zeros_like(rhs), pt, "solver")
    assert bool(r.converged)


def test_sparse_refined_inverse():
    """f32 inverse + sparse-f64 refinement: each refinement step contracts
    the solve error (run directly on CPU; the build path gates on TPU)."""
    disc, A, rhs, topo, pou = setup(cells=(16, 16))
    lc = jnp.asarray(extraction_map(topo, np.asarray(A.colsT).T))
    s2g = jnp.asarray(topo.sub2glob)
    valid = jnp.asarray(topo.valid)
    A_sub = extract_subdomain_dense(A, s2g, valid, lc)
    f64 = factor_batched(A_sub, "cholesky", mode="inverse", refine_steps=1)
    rows = jnp.minimum(s2g, A.n - 1)
    sub_vals, _ = A.rows_dense_gather(rows)
    sub_vals = sub_vals * valid[:, :, None]
    sub_vals = jnp.where(lc >= topo.n_pad, 0.0, sub_vals)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=s2g.shape)) * valid
    x_ref = f64.solve(b)
    errs = []
    for steps in (0, 1, 2):
        sri = SparseRefinedInverse(inv32=f64.inv.astype(jnp.float32),
                                   sub_vals=sub_vals, sub_cols=lc,
                                   steps=steps)
        errs.append(float(jnp.abs(sri.solve(b) - x_ref).max()
                          / jnp.abs(x_ref).max()))
    assert errs[1] < 0.5 * errs[0]
    assert errs[2] <= errs[1] * 1.5  # monotone-ish (floor-limited)


def test_bicgstab_breakdown_flag():
    """<rt, A rt> = 0 underflows ISTL's h-breakdown guard on the first
    half-step: ISTL throws SolverAbort (solvers.hh), the jitted solver
    reports it via result.breakdown instead of silently continuing."""
    import jax
    from ddm_tpu.solvers.krylov import bicgstab_solve

    op = jax.tree_util.Partial(lambda x: jnp.stack([x[1], -x[0]]))
    b = jnp.asarray([1.0, 0.0])
    res = bicgstab_solve(op, None, b, jnp.zeros_like(b),
                         reduction=1e-10, maxit=10)
    assert bool(res.breakdown)
    assert not bool(res.converged)


def test_bicgstab_half_iteration_convergence():
    """With A = I the first half-step already zeroes the residual: ISTL's
    it += .5 accounting stops there (iterations = ceil(0.5) = 1) instead of
    running the stabilization half."""
    import jax
    from ddm_tpu.solvers.krylov import bicgstab_solve

    op = jax.tree_util.Partial(lambda x: x)
    b = jnp.asarray([1.0, 2.0, 3.0])
    res = bicgstab_solve(op, None, b, jnp.zeros_like(b),
                         reduction=1e-12, maxit=10)
    assert bool(res.converged) and not bool(res.breakdown)
    assert int(res.iterations) == 1
    assert float(res.defect) < 1e-14


def test_bicgstab_solves_spd_system():
    """Regression: full-step path still solves a real SPD system with the
    half-step bookkeeping."""
    import jax
    from ddm_tpu.solvers.krylov import bicgstab_solve

    rng = np.random.default_rng(5)
    n = 40
    Q = rng.normal(size=(n, n))
    A = jnp.asarray(Q @ Q.T + n * np.eye(n))
    op = jax.tree_util.Partial(lambda M, x: M @ x, A)
    b = jnp.asarray(rng.normal(size=n))
    res = bicgstab_solve(op, None, b, jnp.zeros_like(b),
                         reduction=1e-10, maxit=200)
    assert bool(res.converged) and not bool(res.breakdown)
    x = np.asarray(res.x)
    np.testing.assert_allclose(np.asarray(A) @ x, np.asarray(b), rtol=1e-8)


def test_gmres_dd_ortho_parity():
    """ortho='dd' (double-single CGS2 basis dots) must reach the same target
    with the same iteration count (+-1) as f64 orthogonalization."""
    import jax.numpy as jnp
    from ddm_tpu.api import default_ptree, setup_problem
    from ddm_tpu.fem import problems as prob
    from ddm_tpu.solvers.krylov import gmres_solve, operator_of, prec_of
    from ddm_tpu.precond.schwarz import build_schwarz
    from ddm_tpu.core.indexmaps import pou_weights

    pt = default_ptree()
    pt["gridsize"] = 48
    p = setup_problem(pt, problem=prob.islands(), parts=(4, 4))
    P = build_schwarz(p.A, p.topo, p.pou, p.ptree)
    r64 = gmres_solve(operator_of(p.A), prec_of(P), p.rhs,
                      jnp.zeros_like(p.rhs), reduction=1e-8, maxit=300,
                      restart=50, ortho="f64")
    rdd = gmres_solve(operator_of(p.A), prec_of(P), p.rhs,
                      jnp.zeros_like(p.rhs), reduction=1e-8, maxit=300,
                      restart=50, ortho="dd")
    assert bool(r64.converged) and bool(rdd.converged)
    # +-2: both paths converge honestly; the exact count wobbles by an
    # iteration with the f64 reduction tiling (round 3 switched the CGS2
    # dots to multiply+reduce — same f64 arithmetic, different sum order)
    assert abs(int(rdd.iterations) - int(r64.iterations)) <= 2, (
        int(rdd.iterations), int(r64.iterations))
    # true residuals comparable (left-preconditioned GMRES measures the
    # PRECONDITIONED defect, as ISTL does; the true residual trails it)
    for r in (r64, rdd):
        res = float(jnp.linalg.norm(p.rhs - p.A.mv(r.x))
                    / jnp.linalg.norm(p.rhs))
        assert res < 1e-6, res
