"""Additive/multiplicative combination of preconditioners.

Rebuilds dune/ddm/combined_preconditioner.hh:21-180: additive mode sums the
applications (P = P1 + P2 + ...); multiplicative mode interleaves residual
updates (x_{i+1} = x_i + P_{i+1}(d - A x_i), combined_preconditioner.hh:
144-159) and therefore needs the operator (``set_op`` equivalent: the ``op``
field).  Preconditioners are applied in the order given.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class CombinedPreconditioner:
    precs: tuple  # tuple of preconditioner pytrees (applied in order)
    op: object | None = None  # operator pytree with .mv (multiplicative only)
    mode: str = field(default="additive", metadata=dict(static=True))

    def apply(self, d: jnp.ndarray) -> jnp.ndarray:
        if len(self.precs) == 0:
            raise ValueError(
                "No preconditioners to apply, add them via `precs`"
            )
        x = self.precs[0].apply(d)
        if self.mode == "additive":
            for p in self.precs[1:]:
                x = x + p.apply(d)
        elif self.mode == "multiplicative":
            if self.op is None:
                raise ValueError(
                    "ApplyMode is multiplicative but operator A is not "
                    "provided. Set with `op`"
                )
            for p in self.precs[1:]:
                dnext = d - self.op.mv(x)
                x = x + p.apply(dnext)
        else:
            raise ValueError(
                f"Unknown apply mode '{self.mode}', use additive or "
                "multiplicative"
            )
        return x


def build_combined(precs, ptree=None, op=None, subtree_name="combined_preconditioner"):
    mode = "additive"
    if ptree is not None:
        mode = ptree.sub(subtree_name).get("mode", "additive")
    return CombinedPreconditioner(precs=tuple(precs), op=op, mode=mode)
