"""Nonlinear FEM: residual/Jacobian assembly for -div(alpha grad u) + q(u) = f.

Rebuilds the reference's NonlinearPoissonFEM local operator
(examples/nonlinearpoisson.hh:17-137, there with *numerical* Jacobians via
PDELab::NumericalJacobianVolume) — here the Jacobian is exact and batched:

    r_i(u)  = sum_e int alpha grad u_h . grad phi_i + q(u_h) phi_i - f phi_i
    J_ij(u) = A_laplace + sum_e int q'(u_h) phi_i phi_j

Both are jitted device functions of the coefficient vector; the sparsity
pattern, DDM topology and extraction maps are built once and reused across
Newton iterations (the reference's first-call-vs-update split,
twolevel_schwarz.hh:68-104).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .discretize import Discretization
from .problems import Problem


@dataclass
class NonlinearProblem:
    """-div(alpha grad u) + q(u) = f, u = g on the Dirichlet boundary.

    Reference instance (nonlinearpoisson.cc:36): q(u) = eta * u^2,
    f = |x|^2, g = 0.
    """

    alpha: Callable = lambda x: jnp.ones(x.shape[:-1])
    q: Callable = lambda u: u * u
    dq: Callable = lambda u: 2.0 * u
    f: Callable = lambda x: jnp.sum(x * x, axis=-1)
    g: Callable = lambda x: jnp.zeros(x.shape[:-1])
    is_dirichlet: Callable = lambda x: jnp.ones(x.shape[:-1], bool)
    name: str = "nonlinear_poisson"
    symmetric: bool = True

    def linearized(self) -> Problem:
        """The alpha-part only (used for GenEO/Neumann assembly)."""
        return Problem(
            alpha=self.alpha, f=self.f, g=self.g,
            is_dirichlet=self.is_dirichlet, name=self.name + "_lin",
        )


class NonlinearDiscretization(Discretization):
    """Discretization whose assemble depends on the current iterate."""

    def __init__(self, grid, problem: NonlinearProblem, degree: int = 1):
        super().__init__(grid, problem.linearized(), n_comp=1, degree=degree)
        self.nl = problem
        self._elems_j = jnp.asarray(self._elem_nodes)

    def residual_jacobian(self, u: jnp.ndarray):
        """(r, J) at iterate u (both honoring Dirichlet constraints:
        residual zeroed, Jacobian symmetric-eliminated)."""
        from ..core.sparse import eliminate_dirichlet
        from .assemble import element_geometry

        quad = self.quad
        xq, grads, jxw = element_geometry(quad, self.xe)
        u_e = u[self._elems_j]  # (n_e, nd)
        uq = jnp.einsum("qi,ei->eq", quad.phi, u_e)
        graduq = jnp.einsum("eqid,ei->eqd", grads, u_e)
        alpha = self.nl.alpha(xq)
        fq = self.nl.f(xq)
        re = (
            jnp.einsum("eq,eqd,eqid->ei", jxw * alpha, graduq, grads)
            + jnp.einsum("eq,qi->ei", jxw * self.nl.q(uq), quad.phi)
            - jnp.einsum("eq,qi->ei", jxw * fq, quad.phi)
        )
        Je = jnp.einsum("eq,eqig,eqjg->eij", jxw * alpha, grads, grads)
        Je = Je + jnp.einsum("eq,qi,qj->eij", jxw * self.nl.dq(uq), quad.phi, quad.phi)

        r = jnp.zeros(self.n_dofs, u.dtype).at[self._dof_scatter].add(re.reshape(-1))
        J = self.pattern.assemble(Je.reshape(-1))
        dmask = self.dirichlet_mask
        r = jnp.where(dmask, 0.0, r)
        J = eliminate_dirichlet(J, dmask)
        return r, J

    def initial_guess(self) -> jnp.ndarray:
        """Dirichlet interpolant (zero elsewhere)."""
        return self.dirichlet_values
