"""MatrixMarket / array IO helpers.

The reference reads/writes MatrixMarket throughout its tests
(dune/ddm/test/test_eigensolver.cc loads A.mtx/B.mtx; the Galerkin fixture
embeds .mtx strings).  Thin wrappers over scipy.io keep that workflow.
"""

from __future__ import annotations

import io as _io

import jax.numpy as jnp
import numpy as np
import scipy.io
import scipy.sparse as sps

from .sparse import EllPattern, SparseELL


def read_matrix_market(source) -> tuple[EllPattern, SparseELL]:
    """Read a MatrixMarket file/path/string into (pattern, matrix)."""
    if isinstance(source, str) and source.lstrip().startswith("%%MatrixMarket"):
        source = _io.StringIO(source)
    A = sps.csr_matrix(scipy.io.mmread(source))
    coo = A.tocoo()
    pat = EllPattern.from_coo(coo.row, coo.col, A.shape[0])
    return pat, pat.from_scipy_vals(A)


def write_matrix_market(path: str, pattern: EllPattern, ell: SparseELL,
                        comment: str = "") -> None:
    scipy.io.mmwrite(path, pattern.to_scipy(ell), comment=comment)
