"""Energy-minimal (discrete-harmonic) extension, batched.

Rebuilds EnergyMinimalExtension (dune/ddm/energy_minimal_extension.hh:36-229):
given Dirichlet data u_b on a constraint set, solve A_ii u_i = -A_ib u_b on
the free set.  The reference extracts an interior submatrix, factors it with
UMFPACK (w/ optional SIMD multi-vector resolves); here the free set is
expressed by a *mask* on the padded dense subdomain batch — rows/cols outside
the free set are replaced by identity — and all right-hand sides (one per
basis vector, over all subdomains) solve in one batched call.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..solvers.direct import factor_batched


def masked_operator(A: jnp.ndarray, free_mask: jnp.ndarray) -> jnp.ndarray:
    """A with identity rows/cols outside ``free_mask`` (n_sub, p) — the
    batched equivalent of extracting the A_ii block."""
    f = free_mask.astype(bool)
    keep = f[:, :, None] & f[:, None, :]
    p = A.shape[-1]
    eye = jnp.eye(p, dtype=A.dtype)
    return jnp.where(keep, A, 0.0) + eye[None] * (~f)[:, :, None]


def energy_minimal_extension(
    A: jnp.ndarray,
    free_mask: jnp.ndarray,
    U_bnd: jnp.ndarray,
    solver_type: str = "lu",
) -> jnp.ndarray:
    """Extend boundary data energy-minimally into the free set.

    A: (n_sub, p, p) dense subdomain (Dirichlet) matrices.
    free_mask: (n_sub, p) — dofs solved for ("interior" of the extension).
    U_bnd: (n_sub, nev, p) data vectors; only values OUTSIDE free_mask are
    used as Dirichlet data.
    Returns (n_sub, nev, p): data on the constraint set, extension on the
    free set (zero where the data was zero and the dof is outside both).
    """
    f = free_mask.astype(bool)
    Ub = jnp.where(f[:, None, :], 0.0, U_bnd)
    # rhs_i = -(A u_b)_i on the free set
    R = -jnp.einsum("spq,skq->skp", A, Ub)
    R = jnp.where(f[:, None, :], R, 0.0)
    M = masked_operator(A, f)
    fac = factor_batched(M, solver_type, mode="factors")
    Z = fac.solve(R.transpose(0, 2, 1)).transpose(0, 2, 1)
    Z = jnp.where(f[:, None, :], Z, 0.0)
    return Ub + Z


def harmonic_parameter_basis(
    A_con: jnp.ndarray,
    int_mask: jnp.ndarray,
    par_mask: jnp.ndarray,
    solver_type: str = "lu",
) -> jnp.ndarray:
    """Implicit basis of the A-harmonic space: returns Hfull (n_sub, p, p)
    with u = Hfull @ w for parameter data w supported on ``par_mask``;
    columns outside par_mask are zero.

    Hfull = [X; I] with X = -A_ii^{-1} A_i,par (the constraint
    (A_con u)_i = 0 for i in int_mask solved for all unit parameter data at
    once — the batched replacement of the reference's saddle-point Lagrange
    blocks, coarse_spaces.hh:763-778).
    """
    i = int_mask.astype(bool)
    b = par_mask.astype(bool)
    Aip = jnp.where(i[:, :, None] & b[:, None, :], A_con, 0.0)
    M = masked_operator(A_con, i)
    fac = factor_batched(M, solver_type, mode="factors")
    X = -fac.solve(Aip)
    X = jnp.where(i[:, :, None] & b[:, None, :], X, 0.0)
    p = A_con.shape[-1]
    eye = jnp.eye(p, dtype=A_con.dtype)
    return X + eye[None] * b[:, None, :].astype(A_con.dtype)
