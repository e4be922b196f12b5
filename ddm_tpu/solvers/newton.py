"""Newton's method with line search and inexact inner solves.

Mirrors PDELab's NewtonMethod as driven by the reference
(examples/nonlinearpoisson.cc:153-171 + twolevel_schwarz.hh:27-175):

* termination on ||r(u)|| < max(Reduction * ||r(u0)||, AbsoluteLimit);
* Hackbusch-Reusken backtracking line search (halving, bounded trials);
* inexact-Newton forcing: the inner Krylov reduction per step is
  min(MinLinearReduction, defect^2 / prev_defect^2) unless
  fixed_linear_reduction is set (PDELab semantics);
* the DDM setup (topology, sparsity, extraction maps) is built ONCE; each
  Newton step only refreshes matrix values and refactorizes — the reference's
  first-call-vs-update split (twolevel_schwarz.hh:68-104).  Because every
  per-step function is jitted with static shapes, re-solves hit the compile
  cache.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..config import ParamTree
from ..obs.logger import logger


@dataclass
class NewtonResult:
    u: jnp.ndarray
    iterations: int
    converged: bool
    defect0: float
    defect: float
    linear_iterations: int
    history: list


def newton_solve(
    residual_jacobian: Callable,  # u -> (r, J)
    linear_solve: Callable,  # (J, r, reduction) -> (dz, n_iters)
    u0: jnp.ndarray,
    reduction: float = 1e-8,
    maxit: int = 40,
    abs_limit: float = 1e-12,
    min_linear_reduction: float = 1e-3,
    fixed_linear_reduction: bool = False,
    line_search_max: int = 10,
    line_search_damping: float = 0.5,
    line_search_accept_best: bool = False,
) -> NewtonResult:
    u = u0
    r, J = residual_jacobian(u)
    def0 = float(jnp.linalg.norm(r))
    defect = def0
    target = max(reduction * def0, abs_limit)
    history = [def0]
    lin_total = 0
    prev = def0

    for it in range(1, maxit + 1):
        if defect <= target:
            return NewtonResult(u, it - 1, True, def0, defect, lin_total, history)
        if fixed_linear_reduction:
            lin_red = min_linear_reduction
        else:
            # PDELab-style forcing: quadratic model of the expected decrease
            lin_red = min(min_linear_reduction, (defect / prev) ** 2) if it > 1 \
                else min_linear_reduction
            lin_red = max(lin_red, 1e-12)
        dz, n_lin = linear_solve(J, r, lin_red)
        lin_total += int(n_lin)

        # Hackbusch-Reusken backtracking line search: accept on the
        # sufficient-decrease test ||r(u - lam dz)|| < (1 - lam/4) ||r(u)||
        # (PDELab LineSearchHackbuschReusken), optionally falling back to
        # the best trial seen (PDELab's AcceptBest variant)
        lam = 1.0
        best = None
        best_seen = None
        for _ in range(line_search_max):
            u_try = u - lam * dz
            r_try, J_try = residual_jacobian(u_try)
            d_try = float(jnp.linalg.norm(r_try))
            if best_seen is None or d_try < best_seen[3]:
                best_seen = (u_try, r_try, J_try, d_try)
            if d_try < (1.0 - lam / 4.0) * defect:
                best = (u_try, r_try, J_try, d_try)
                break
            lam *= line_search_damping
        if best is None and line_search_accept_best and best_seen[3] < defect:
            logger.debug("Newton line search accepting best trial (defect {})",
                         best_seen[3])
            best = best_seen
        if best is None:
            logger.warn("Newton line search failed at iteration {}", it)
            return NewtonResult(u, it, False, def0, defect, lin_total, history)
        u, r, J, d_new = best
        prev, defect = defect, d_new
        history.append(defect)
        logger.debug("Newton it {}: defect {} (rate {})", it, defect, defect / prev)

    return NewtonResult(u, maxit, defect <= target, def0, defect, lin_total, history)


def newton_from_config(residual_jacobian, linear_solve, u0, ptree: ParamTree,
                       subtree_name: str = "newton") -> NewtonResult:
    sub = ptree.sub(subtree_name)
    return newton_solve(
        residual_jacobian,
        linear_solve,
        u0,
        reduction=sub.get("Reduction", 1e-8),
        maxit=sub.get("MaxIterations", 40),
        abs_limit=sub.get("AbsoluteLimit", 1e-12),
        min_linear_reduction=sub.get("MinLinearReduction", 1e-3),
        fixed_linear_reduction=sub.get("FixedLinearReduction", False),
        line_search_max=sub.get("LineSearchMaxIterations", 10),
        line_search_damping=sub.get("LineSearchDampingFactor", 0.5),
        line_search_accept_best=sub.get("LineSearchAcceptBest", False),
    )
