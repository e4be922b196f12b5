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


def test_hackbusch_reusken_line_search():
    """The line search accepts on the sufficient-decrease test
    ||r(u - lam dz)|| < (1 - lam/4) ||r(u)|| (PDELab
    LineSearchHackbuschReusken), not on simple decrease: a direction giving
    only marginal decrease at lam=1 must be damped."""
    from ddm_tpu.solvers.newton import newton_solve

    calls = []

    # 1-D problem r(u) = u (linear), but feed Newton a deliberately BAD
    # 10x-overshooting step via a scaled "Jacobian": at lam=1 the defect
    # grows 9x (rejected), at lam=0.125 it shrinks to 0.75|u| <
    # (1 - 0.125/4)|u| (accepted by sufficient decrease)
    def residual_jacobian(u):
        calls.append(float(u[0]))
        return u, jnp.asarray([[0.1]])

    def linear_solve(J, r, red):
        return r / J[0, 0], 1  # dz = 10 u

    res = newton_solve(residual_jacobian, linear_solve,
                       jnp.asarray([1.0]), reduction=1e-10, maxit=60)
    assert res.converged
    # simple-decrease acceptance at lam=0.1875... does not exist; the
    # accepted damping must satisfy the (1 - lam/4) margin each step
    hist = res.history
    assert all(hist[i + 1] < hist[i] for i in range(len(hist) - 1))


def test_line_search_accept_best():
    """PDELab's AcceptBest fallback: when no trial passes the sufficient-
    decrease test, the best strictly-decreasing trial is taken instead of
    failing."""
    from ddm_tpu.solvers.newton import newton_solve

    # r(u) = sign(u) * sqrt(|u|): Newton overshoots wildly; sufficient
    # decrease (1 - lam/4) fails at lam=1 (defect ratio ~ 1) but some
    # damped trial still strictly decreases
    def residual_jacobian(u):
        r = jnp.sign(u) * jnp.sqrt(jnp.abs(u) + 1e-30)
        J = jnp.asarray([[0.5 / float(jnp.sqrt(jnp.abs(u[0]) + 1e-30))]])
        return r, J

    def linear_solve(J, r, red):
        return r / J[0, 0], 1

    res_strict = newton_solve(residual_jacobian, linear_solve,
                              jnp.asarray([1.0]), reduction=1e-3, maxit=8,
                              line_search_accept_best=False)
    res_best = newton_solve(residual_jacobian, linear_solve,
                            jnp.asarray([1.0]), reduction=1e-3, maxit=8,
                            line_search_accept_best=True)
    # accept_best must do at least as well as the strict variant
    assert res_best.defect <= res_strict.defect
