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

:func:`lobpcg_gevp_adaptive` adds the reference's production wrapper
(spectra.hh:111-215): a seeded deterministic start block, an automatic
A-inverse preconditioner, convergence at ``params.tolerance``, and the
adaptive nev-doubling escalation against ``params.threshold``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .params import EigensolverParams


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
    Returns (lam (n_sub, m), V (n_sub, m, p), residual norms (n_sub, m),
    iterations taken).

    Convergence: stops when every block vector in every subdomain satisfies
    ||A x - theta C x|| <= tol * (||A x|| + |theta| ||C x||), or at maxit —
    the batched analogue of the reference's per-vector Lanczos convergence
    test (Spectra compute(), spectra.hh:127-129).

    Note the pencil orientation: LOBPCG minimizes the Rayleigh quotient of
    (A, C); C must be PSD on the trial space.  Degenerate C directions are
    suppressed by the whitening floor.
    """
    n_sub, p, _ = A.shape
    if m is None:
        m = X0.shape[-1]
    eps = jnp.asarray(1e-12 if A.dtype == jnp.float64 else 1e-6, A.dtype)
    tol_a = jnp.asarray(tol, A.dtype)

    def cond(carry):
        X, P, it, maxres = carry
        return (it < maxit) & (maxres > tol_a)

    def body(carry):
        X, P, it, _ = carry
        AX = jnp.einsum("spq,sqk->spk", A, X)
        CX = jnp.einsum("spq,sqk->spk", C, X)
        theta = jnp.einsum("spk,spk->sk", X, AX) / jnp.maximum(
            jnp.einsum("spk,spk->sk", X, CX), eps
        )
        R = AX - theta[:, None, :] * CX
        # relative residual per block vector
        rn = jnp.sqrt(jnp.einsum("spk,spk->sk", R, R))
        denom = jnp.sqrt(jnp.einsum("spk,spk->sk", AX, AX)) + jnp.abs(
            theta
        ) * jnp.sqrt(jnp.einsum("spk,spk->sk", CX, CX))
        maxres = jnp.max(rn / jnp.maximum(denom, eps))
        if prec_inv is not None:
            Wd = jnp.einsum("spq,sqk->spk", prec_inv, R)
        else:
            Wd = R
        S = jnp.concatenate([X, Wd, P], axis=2)  # (n_sub, p, 3m)
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
        return (Xn, Pn, it + 1, maxres)

    P0 = jnp.zeros_like(X0)
    big = jnp.asarray(jnp.inf, A.dtype)
    X, P, it, _ = jax.lax.while_loop(cond, body, (X0, P0, jnp.int32(0), big))

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
    return lam, X.transpose(0, 2, 1), rn, it


def _default_prec(A: jnp.ndarray) -> jnp.ndarray:
    """Regularized explicit A-inverse: the batched analogue of the
    reference's reuse of the UMFPACK subdomain factorization inside the
    eigensolve (spectra.hh:42-62)."""
    from ..solvers.direct import factor_batched

    p = A.shape[-1]
    scale = jnp.mean(jnp.abs(jnp.diagonal(A, axis1=1, axis2=2)), axis=1)
    eps = 1e-10 * jnp.maximum(scale, 1.0)
    Areg = A + eps[:, None, None] * jnp.eye(p, dtype=A.dtype)[None]
    fac = factor_batched(Areg, "cholesky", mode="inverse", refine_steps=0)
    return fac.inv


def lobpcg_gevp_adaptive(
    A: jnp.ndarray,
    C: jnp.ndarray,
    params: EigensolverParams,
    prec_inv: jnp.ndarray | None = None,
):
    """Production LOBPCG wrapper with the reference's adaptive selection
    (spectra_gevp_op, spectra.hh:111-215).

    * deterministic start block seeded by ``params.seed``;
    * block width starts at max(nev, blocksize); with ``threshold > 0``, if
      any subdomain's largest computed eigenvalue still lies below the
      threshold — meaning eigenpairs below the threshold may have been
      missed — the width doubles (nev *= 2, spectra.hh:185) up to
      ``nev_max`` and the solve repeats;
    * returns (lam, V, active) in the same static (n_sub, params.max_kept)
      layout as :func:`..dense_gevp.solve_gevp_dense`, with the same
      threshold-prefix selection, so the two are drop-in interchangeable.
    """
    n_sub, p, _ = A.shape
    m_out = min(params.max_kept, p)
    if prec_inv is None:
        prec_inv = _default_prec(A)
    key = jax.random.PRNGKey(params.seed)

    m = min(max(params.nev, params.blocksize), p, m_out)
    while True:
        X0 = jax.random.normal(key, (n_sub, p, m), A.dtype)
        lam, V, rn, _ = lobpcg_gevp(
            A, C, X0, prec_inv=prec_inv, maxit=params.maxit,
            tol=params.tolerance,
        )
        if params.threshold <= 0 or m >= m_out:
            break
        if bool((lam[:, -1] >= params.threshold).all()):
            break
        m = min(2 * m, m_out)  # nev doubling (spectra.hh:185)

    # pad to the static output width
    if m < m_out:
        lam = jnp.concatenate(
            [lam, jnp.full((n_sub, m_out - m), jnp.inf, lam.dtype)], axis=1
        )
        V = jnp.concatenate(
            [V, jnp.zeros((n_sub, m_out - m, p), V.dtype)], axis=1
        )
    # threshold-prefix selection, mirroring dense_gevp.solve_gevp_dense
    if params.threshold > 0:
        keep = lam < params.threshold
        keep = keep.at[:, 0].set(True)  # at least one (spectra.hh:162)
        keep = jnp.cumprod(keep.astype(jnp.int32), axis=1).astype(bool)
    else:
        keep = jnp.ones((n_sub, m_out), bool)
    keep = keep & jnp.isfinite(lam)
    keep = keep.at[:, 0].set(keep[:, 0] | (params.threshold <= 0))
    return lam, V, keep
