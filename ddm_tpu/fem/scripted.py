"""Runtime-scripted PDE coefficients from a Python file.

The reference scripts coefficients through vendored LuaJIT
(examples/poisson_coefficient.lua etc., evaluated per quadrature point via
LuaProblem, examples/poisson_problems.hh).  The TPU analogue loads a Python
file defining vectorized jnp callables — same workflow (edit a script, rerun
the driver with ``-coefficient_file``), but the functions trace into the
XLA assembly kernels instead of being interpreted per point.

The scripted file may define any of: ``alpha(x)``, ``b(x)``, ``c(x)``,
``f(x)``, ``g(x)``, ``is_dirichlet(x)`` (vectorized over (..., d) coords),
or scalar-signature ``alpha(x, y[, z])`` variants which are adapted
automatically.
"""

from __future__ import annotations

import inspect
import runpy

import jax.numpy as jnp

from .problems import Problem


def _adapt(fn, vector_valued=False):
    """Accept either vectorized f(coords) or per-point f(x, y[, z])."""
    n_args = len(inspect.signature(fn).parameters)
    if n_args == 1:
        return fn

    def wrapped(xq):
        comps = [xq[..., i] for i in range(n_args)]
        out = fn(*comps)
        if vector_valued and isinstance(out, (tuple, list)):
            return jnp.stack([jnp.broadcast_to(o, xq.shape[:-1]) for o in out],
                             axis=-1)
        return out

    return wrapped


def load_problem(path: str, name: str | None = None) -> Problem:
    ns = runpy.run_path(path)
    kwargs = {"name": name or path}
    if "alpha" in ns:
        kwargs["alpha"] = _adapt(ns["alpha"])
    if "f" in ns:
        kwargs["f"] = _adapt(ns["f"])
    if "g" in ns:
        kwargs["g"] = _adapt(ns["g"])
    if "c" in ns:
        kwargs["c"] = _adapt(ns["c"])
    if "is_dirichlet" in ns:
        kwargs["is_dirichlet"] = _adapt(ns["is_dirichlet"])
    if "b" in ns:
        kwargs["b"] = _adapt(ns["b"], vector_valued=True)
        kwargs["symmetric"] = False
    elif "b1" in ns and "b2" in ns:
        b1, b2 = _adapt(ns["b1"]), _adapt(ns["b2"])

        def b(xq):
            return jnp.stack(
                [jnp.broadcast_to(b1(xq), xq.shape[:-1]),
                 jnp.broadcast_to(b2(xq), xq.shape[:-1])], axis=-1)

        kwargs["b"] = b
        kwargs["symmetric"] = False
    return Problem(**kwargs)
