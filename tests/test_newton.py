"""M6: Newton nonlinear solver (BASELINE config 5) — nonlinear Poisson
-Δu + η u² = f with two-level Schwarz inner solves and setup reuse."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse.linalg as spla

from ddm_tpu.config import ParamTree, read_ini
from ddm_tpu.fem import structured_grid
from ddm_tpu.fem.nonlinear import NonlinearDiscretization, NonlinearProblem
from ddm_tpu.solvers.nonlinear_driver import TwoLevelNewtonSolver


def newton_ptree():
    return ParamTree(
        {
            "overlap": 2,
            "newton": {"Reduction": 1e-8},
            "solver": {"type": "bicgstabsolver", "maxit": 1000},
            "schwarz": {"type": "restricted",
                        "subdomain_solver": {"type": "umfpack"}},
            "coarse_solver": {"type": "lu"},
            "combined_preconditioner": {"mode": "multiplicative"},
            "pou": {"type": "distance", "shrink": 0},
        }
    )


def test_newton_manufactured_solution():
    """-Δu + u² = f with exact u* = sin(pi x) sin(pi y)."""

    def f(xq):
        s = jnp.sin(np.pi * xq[..., 0]) * jnp.sin(np.pi * xq[..., 1])
        return 2 * np.pi**2 * s + s * s

    nlp = NonlinearProblem(f=f, q=lambda u: u * u, dq=lambda u: 2 * u)
    grid = structured_grid((24, 24))
    disc = NonlinearDiscretization(grid, nlp)
    solver = TwoLevelNewtonSolver(disc, newton_ptree(), parts=(2, 2))
    res = solver.solve()
    assert res.converged
    exact = np.sin(np.pi * grid.nodes[:, 0]) * np.sin(np.pi * grid.nodes[:, 1])
    assert np.abs(np.asarray(res.u) - exact).max() < 5e-3


def test_newton_quadratic_convergence():
    nlp = NonlinearProblem(q=lambda u: 5.0 * u * u, dq=lambda u: 10.0 * u)
    grid = structured_grid((16, 16))
    disc = NonlinearDiscretization(grid, nlp)
    solver = TwoLevelNewtonSolver(disc, newton_ptree(), parts=(2, 2))
    res = solver.solve()
    assert res.converged
    assert res.iterations <= 8
    h = res.history
    # superlinear tail: last step reduces defect by >= 1e3
    assert h[-1] < 1e-3 * h[-2]


def test_newton_reference_problem():
    """The reference's problem: q(u) = eta u², f = |x|², g = 0
    (nonlinearpoisson.cc:36,60)."""
    nlp = NonlinearProblem(
        q=lambda u: 10.0 * u * u, dq=lambda u: 20.0 * u,
        f=lambda x: jnp.sum(x * x, axis=-1),
    )
    grid = structured_grid((32, 32))
    disc = NonlinearDiscretization(grid, nlp)
    solver = TwoLevelNewtonSolver(disc, newton_ptree(), parts=(4, 4))
    res = solver.solve()
    assert res.converged
    # cross-check vs a scipy-based Newton on the same discretization
    u = jnp.asarray(np.zeros(disc.n_dofs))
    for _ in range(30):
        r, J = disc.residual_jacobian(u)
        Jsp = disc.pattern.to_scipy(J).tocsc()
        du = spla.spsolve(Jsp, np.asarray(r))
        u = u - jnp.asarray(du)
        if float(jnp.linalg.norm(r)) < 1e-12:
            break
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u), atol=1e-7)


def test_newton_linear_problem_single_step():
    """With q = 0 the first Newton step must solve the problem."""
    nlp = NonlinearProblem(q=lambda u: 0 * u, dq=lambda u: 0 * u,
                           f=lambda x: jnp.ones(x.shape[:-1]))
    grid = structured_grid((16, 16))
    disc = NonlinearDiscretization(grid, nlp)
    solver = TwoLevelNewtonSolver(disc, newton_ptree(), parts=(2, 2))
    res = solver.solve()
    assert res.converged
    assert res.iterations <= 2
