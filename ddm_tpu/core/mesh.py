"""Subdomain-axis SPMD execution: the library's multi-chip path.

The reference distributes one subdomain per MPI rank and moves data with
DUNE parallel index sets (SURVEY.md §2.6, §5.8;
dune/ddm/overlap_extension.hh:53-285, galerkin_preconditioner.hh:151-194).
Here the subdomain batch axis is sharded over a ``jax.sharding.Mesh`` axis
and the three collective classes the algorithms need ride ICI:

* fine-level halo sum (addOwnerCopyToOwnerCopy) -> ``psum`` after the
  device-local scatter-add (precond/schwarz.py ``axis`` branch);
* coarse-defect collection (the reference's rank-0 Gatherv bottleneck) ->
  ``all_gather`` + replicated dense solve (precond/galerkin.py ``axis``
  branch);
* everything else (Krylov dots, SpMV) operates on vectors that are
  replicated across devices, so no collective is needed.

This module provides the glue: partition-spec inference for preconditioner
pytrees, axis-name injection, and a sharded Krylov driver used by
``api.solve(..., mesh=...)``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

DEFAULT_AXIS = "sub"


def subdomain_mesh(n_devices: int | None = None, axis: str = DEFAULT_AXIS) -> Mesh:
    """1-D device mesh over the subdomain axis."""
    n = n_devices if n_devices is not None else len(jax.devices())
    return jax.make_mesh((n,), (axis,))


def with_axis(prec, axis: str | None):
    """Copy of a preconditioner pytree with the mesh-axis name set on every
    component that reduces across subdomains (Schwarz scatter psum, Galerkin
    coarse all_gather).  Recurses through CombinedPreconditioner."""
    from ..precond.combined import CombinedPreconditioner

    if isinstance(prec, CombinedPreconditioner):
        return dataclasses.replace(
            prec, precs=tuple(with_axis(q, axis) for q in prec.precs)
        )
    if hasattr(prec, "axis"):
        return dataclasses.replace(prec, axis=axis)
    return prec


def batch_specs(tree, n_sub: int, axis: str):
    """PartitionSpec pytree for shard_map in_specs: leaves whose leading dim
    is the subdomain batch (== n_sub) shard over ``axis``; everything else
    (global vectors, the replicated coarse factor, scalars) replicates.

    Requires an unambiguous batch size: no non-batched leaf dimension may
    accidentally equal n_sub on axis 0 — true for every preconditioner here
    (global n >> n_sub, coarse factor carries a leading 1)."""

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n_sub:
            return P(axis)
        return P()

    return jax.tree.map(spec, tree)


def replicated_specs(tree):
    return jax.tree.map(lambda _: P(), tree)


def shard_batched(tree, mesh: Mesh, n_sub: int, axis: str = DEFAULT_AXIS):
    """device_put the pytree with subdomain-batched leaves sharded over the
    mesh (so HBM for factors/bases is actually distributed) and the rest
    replicated."""

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree, batch_specs(tree, n_sub, axis))


def solve_sharded(
    ell,
    prec,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    ptree,
    mesh: Mesh,
    n_sub: int,
    axis: str = DEFAULT_AXIS,
    subtree_name: str = "solver",
):
    """Krylov solve under shard_map over the subdomain axis.

    The operator and the solution/defect vectors are replicated; only the
    preconditioner's subdomain-batched state is sharded.  Produces the same
    iterates (and therefore iteration counts) as the unsharded solve: the
    per-device scatter-add + psum sums exactly the same per-subdomain
    contributions as the single-device scatter-add.
    """
    from ..solvers.krylov import operator_of, prec_of, solve_from_config

    n_dev = mesh.shape[axis]
    if n_sub % n_dev:
        raise ValueError(
            f"subdomain count {n_sub} must divide evenly over the "
            f"{n_dev}-device mesh axis '{axis}'"
        )
    prec_l = with_axis(prec, axis)
    in_specs = (
        replicated_specs(ell),
        batch_specs(prec_l, n_sub, axis),
        P(),
        P(),
    )

    def body(ell_, prec_, b_, x0_):
        return solve_from_config(
            operator_of(ell_), prec_of(prec_), b_, x0_, ptree, subtree_name
        )

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
        )
    )
    return fn(ell, prec_l, b, x0)
