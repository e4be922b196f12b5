"""Batched LOBPCG for generalized eigenproblems.

The reference's own dev tree contains a block Lanczos / Krylov-Schur
eigensolver subsystem whose headers are missing from the snapshot
(SURVEY.md caveats: blockmultivector.hh, subspace_iteration.hh, ...,
"KrylovSchur" referenced by examples/poisson.ini:45); its survivors
(DenseSquareBlockMatrix, the SIMD UMFPackMultivecSolver) show the intent:
*blocked* iteration with multi-vector kernels.  On TPU the natural
incarnation is **LOBPCG over the whole subdomain batch at once**: every
operation is a batched tall-skinny matmul (MXU) and a small dense
Rayleigh-Ritz eigh — this module provides it as the iterative alternative to
the full dense transform (dense_gevp.py) for subdomains too large to eigh.

Solves A v = lambda C v for the ``m`` smallest finite lambda, batched over
(n_sub, p, p) pencils, preconditioned with an (approximate) inverse of A
(the Schwarz subdomain factorization is the natural choice — exactly how the
reference reuses its subdomain factorizations in eigensolves).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rayleigh_ritz(S, A, C, m, eps):
    """Rayleigh-Ritz on the (batched) trial space S (n_sub, p, k):
    returns (theta (n_sub, k), coeff (n_sub, k, k)) of the projected pencil,
    sorted ascending, with C-orthonormalization of the basis built in."""
    G = jnp.einsum("spk,spq,sql->skl", S, C, S)
    H = jnp.einsum("spk,spq,sql->skl", S, A, S)
    # whiten the basis against G; drop near-null trial directions (e.g. the
    # zero P block on the first iteration) so they cannot masquerade as
    # theta ~ 0 eigenpairs
    w, Q = jnp.linalg.eigh(0.5 * (G + jnp.swapaxes(G, 1, 2)))
    good = w > jnp.maximum(w[:, -1:], eps) * 1e-12
    W = jnp.where(good[:, None, :], Q / jnp.sqrt(jnp.maximum(w, eps))[:, None, :], 0.0)
    Hw = jnp.einsum("skl,skm,sln->smn", H, W, W)
    big = jnp.asarray(1e30, H.dtype)
    Hw = Hw + big * jnp.eye(Hw.shape[-1], dtype=H.dtype)[None] * (
        (~good).astype(H.dtype)[:, None, :]
    )
    theta, Z = jnp.linalg.eigh(0.5 * (Hw + jnp.swapaxes(Hw, 1, 2)))
    coeff = jnp.einsum("skl,sln->skn", W, Z)
    return theta, coeff


@partial(jax.jit, static_argnames=("m", "maxit"))
def lobpcg_gevp(
    A: jnp.ndarray,
    C: jnp.ndarray,
    X0: jnp.ndarray,
    prec_inv: jnp.ndarray | None = None,
    m: int | None = None,
    maxit: int = 50,
    tol: float = 1e-6,
):
    """Batched LOBPCG.

    A, C: (n_sub, p, p); X0: (n_sub, p, m) initial block; prec_inv: optional
    (n_sub, p, p) preconditioner (approximate A^{-1}).
    Returns (lam (n_sub, m), V (n_sub, m, p), residual norms (n_sub, m)).

    Note the pencil orientation: LOBPCG minimizes the Rayleigh quotient of
    (A, C); C must be PSD on the trial space.  Degenerate C directions are
    suppressed by the whitening floor.
    """
    n_sub, p, _ = A.shape
    if m is None:
        m = X0.shape[-1]
    eps = jnp.asarray(1e-12 if A.dtype == jnp.float64 else 1e-6, A.dtype)

    def body(carry, _):
        X, P = carry
        AX = jnp.einsum("spq,sqk->spk", A, X)
        CX = jnp.einsum("spq,sqk->spk", C, X)
        theta = jnp.einsum("spk,spk->sk", X, AX) / jnp.maximum(
            jnp.einsum("spk,spk->sk", X, CX), eps
        )
        R = AX - theta[:, None, :] * CX
        if prec_inv is not None:
            W = jnp.einsum("spq,sqk->spk", prec_inv, R)
        else:
            W = R
        S = jnp.concatenate([X, W, P], axis=2)  # (n_sub, p, 3m)
        th, coeff = _rayleigh_ritz(S, A, C, m, eps)
        Cm = coeff[:, :, :m]  # smallest m
        Xn = jnp.einsum("spk,skn->spn", S, Cm)
        # implicit P: the W/P part of the update
        Cp = Cm.at[:, :m, :].set(0.0)
        Pn = jnp.einsum("spk,skn->spn", S, Cp)
        # normalize
        Xn = Xn / jnp.maximum(
            jnp.sqrt(jnp.einsum("spk,spk->sk", Xn, Xn)), eps
        )[:, None, :]
        nrm = jnp.sqrt(jnp.einsum("spk,spk->sk", Pn, Pn))
        Pn = Pn / jnp.maximum(nrm, 1.0)[:, None, :]
        return (Xn, Pn), None

    P0 = jnp.zeros_like(X0)
    (X, P), _ = jax.lax.scan(body, (X0, P0), None, length=maxit)

    AX = jnp.einsum("spq,sqk->spk", A, X)
    CX = jnp.einsum("spq,sqk->spk", C, X)
    lam = jnp.einsum("spk,spk->sk", X, AX) / jnp.maximum(
        jnp.einsum("spk,spk->sk", X, CX), eps
    )
    R = AX - lam[:, None, :] * CX
    rn = jnp.sqrt(jnp.einsum("spk,spk->sk", R, R))
    order = jnp.argsort(lam, axis=1)
    lam = jnp.take_along_axis(lam, order, axis=1)
    rn = jnp.take_along_axis(rn, order, axis=1)
    X = jnp.take_along_axis(X, order[:, None, :], axis=2)
    return lam, X.transpose(0, 2, 1), rn
