"""HBM-resident sparse matrices in padded ELL format.

Replaces DUNE-ISTL's ``BCRSMatrix`` (reference: used throughout, see SURVEY.md
§2.5).  On TPU, compressed-row storage with ragged rows defeats XLA's static
shapes, so the global operator is stored as **padded ELL**: every row holds
``m = max_row_nnz`` column/value slots, padding slots point at a dummy column
``n_rows`` with value 0.  SpMV is then a dense gather + reduction — fully
vectorizable on the VPU with no dynamic shapes.

The host-side :class:`EllPattern` is built once per sparsity pattern and maps
each element-assembly COO entry to its flat ELL slot, so (re-)assembly on
device is a single ``scatter-add`` — this is what makes Newton re-assembly
(reference: twolevel_schwarz.hh:99-104 value re-add with reused symbolics)
a pure device op here.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class SparseELL:
    """Device sparse matrix, padded ELL layout.

    cols: (n, m) int32, padding slots == n (dummy column)
    vals: (n, m) float
    """

    cols: jnp.ndarray
    vals: jnp.ndarray

    @property
    def n(self) -> int:
        return self.cols.shape[0]

    @property
    def m(self) -> int:
        return self.cols.shape[1]

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x.  x: (n,) or (n, k)."""
        if x.ndim == 1:
            xp = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
            return (self.vals * xp[self.cols]).sum(axis=1)
        xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
        # (n, m, k) gather; contract over m
        return jnp.einsum("nm,nmk->nk", self.vals, xp[self.cols])

    def diagonal(self) -> jnp.ndarray:
        row = jnp.arange(self.n)[:, None]
        return jnp.where(self.cols == row, self.vals, 0.0).sum(axis=1)


@dataclass
class EllPattern:
    """Host-side symbolic pattern + assembly scatter map.

    Attributes
    ----------
    n : matrix size
    m : padded row width (max nnz per row)
    cols : (n, m) int32 column ids, padding == n
    coo2slot : (n_coo,) int64 — flat ELL slot (row*m + pos) for each COO entry
               passed to :meth:`from_coo`, in the original COO order.
    """

    n: int
    m: int
    cols: np.ndarray
    coo2slot: np.ndarray
    rows_csr: np.ndarray  # (nnz,) unique-entry row ids (CSR order)
    cols_csr: np.ndarray  # (nnz,) unique-entry col ids (CSR order)
    slot_csr: np.ndarray  # (nnz,) ELL slot of each unique entry

    @staticmethod
    def from_coo(rows: np.ndarray, cols: np.ndarray, n: int) -> "EllPattern":
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        key = rows * n + cols
        uniq, inverse = np.unique(key, return_inverse=True)
        urows = uniq // n
        ucols = uniq % n
        row_nnz = np.bincount(urows, minlength=n)
        m = int(row_nnz.max()) if row_nnz.size else 1
        row_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(row_nnz, out=row_start[1:])
        pos_in_row = np.arange(uniq.size) - row_start[urows]
        slot = urows * m + pos_in_row
        ell_cols = np.full((n, m), n, dtype=np.int32)
        ell_cols.reshape(-1)[slot] = ucols
        return EllPattern(
            n=n,
            m=m,
            cols=ell_cols,
            coo2slot=slot[inverse],
            rows_csr=urows,
            cols_csr=ucols,
            slot_csr=slot,
        )

    # -- device-side assembly ------------------------------------------------
    def assemble(self, coo_vals: jnp.ndarray) -> SparseELL:
        """Scatter-add COO values (in from_coo order) into a SparseELL."""
        flat = jnp.zeros((self.n * self.m,), coo_vals.dtype)
        flat = flat.at[jnp.asarray(self.coo2slot)].add(coo_vals.reshape(-1))
        return SparseELL(cols=jnp.asarray(self.cols), vals=flat.reshape(self.n, self.m))

    def from_scipy_vals(self, sp_csr) -> SparseELL:
        """Build a SparseELL carrying the values of a scipy CSR matrix with
        the same pattern (host path, used in tests)."""
        import scipy.sparse as sps

        a = sps.csr_matrix(sp_csr)
        vals = np.zeros((self.n * self.m,))
        vals[self.slot_csr] = np.asarray(a[self.rows_csr, self.cols_csr]).ravel()
        return SparseELL(cols=jnp.asarray(self.cols), vals=jnp.asarray(vals.reshape(self.n, self.m)))

    def to_scipy(self, ell: SparseELL):
        import scipy.sparse as sps

        vals = np.asarray(ell.vals).reshape(-1)[self.slot_csr]
        return sps.csr_matrix(
            (vals, (self.rows_csr, self.cols_csr)), shape=(self.n, self.n)
        )


def jacobi_equilibrate(ell: SparseELL, b: jnp.ndarray):
    """Symmetric Jacobi equilibration: A' = D^{-1/2} A D^{-1/2}, b' = D^{-1/2} b.

    Compresses the dynamic range of high-contrast coefficient problems (the
    reference's heterogeneous test cases have 1e6+ contrast) so f64-emulated
    TPU arithmetic and f32 fast paths keep full effective precision.  The
    solution transforms back as x = D^{-1/2} x'; returns (A', b', scale) with
    ``scale = D^{-1/2}``.  Iteration counts of Jacobi-equilibrated runs match
    the unequilibrated reference solves to within an iteration in practice
    (the preconditioned operators are similar).
    """
    diag = ell.diagonal()
    scale = jnp.where(diag > 0, 1.0 / jnp.sqrt(jnp.abs(diag)), 1.0)
    sp = jnp.concatenate([scale, jnp.zeros((1,), scale.dtype)])
    vals = ell.vals * scale[:, None] * sp[ell.cols]
    return SparseELL(cols=ell.cols, vals=vals), b * scale, scale


def eliminate_dirichlet(
    ell: SparseELL, dmask: jnp.ndarray, symmetric: bool = True
) -> SparseELL:
    """Symmetric Dirichlet elimination on ELL values.

    Mirrors the reference semantics (examples/pdelab_helper.hh:33-46):
    Dirichlet rows become identity rows; with ``symmetric``, Dirichlet columns
    in non-Dirichlet rows are zeroed.  ``dmask``: (n,) bool/0-1.
    """
    n = ell.n
    d = dmask.astype(bool)
    dp = jnp.concatenate([d, jnp.zeros((1,), bool)])  # padding col never dirichlet
    row = jnp.arange(n)[:, None]
    row_d = d[:, None]
    col_d = dp[ell.cols]
    is_diag = ell.cols == row
    vals = ell.vals
    vals = jnp.where(row_d, jnp.where(is_diag, 1.0, 0.0), vals)
    if symmetric:
        vals = jnp.where(~row_d & col_d, 0.0, vals)
    return SparseELL(cols=ell.cols, vals=vals)
