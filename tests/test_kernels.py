"""Pallas kernel correctness (interpret mode — runs on the CPU test mesh)."""

import jax.numpy as jnp
import numpy as np

from ddm_tpu.kernels import dd_matvec_pallas
from ddm_tpu.solvers.direct import dd_matvec, dd_split


def test_dd_matvec_pallas_matches_xla():
    """Fused one-pass kernel == the three-matmul XLA formulation up to f32
    accumulation-order noise, including the zero-padded storage contract
    (q < P) and high-dynamic-range inputs."""
    rng = np.random.default_rng(0)
    n_sub, P, q = 4, 256, 200
    A = rng.standard_normal((n_sub, P, P))
    A[:, q:, :] = 0
    A[:, :, q:] = 0
    hi, lo = dd_split(jnp.asarray(A))
    d = jnp.asarray(
        rng.standard_normal((n_sub, q)) * 10.0 ** rng.uniform(-6, 6, (n_sub, q))
    )
    y_ref = dd_matvec(hi[:, :q, :q], lo[:, :q, :q], d)
    y = dd_matvec_pallas(hi, lo, d, interpret=True)
    err = float(jnp.abs(y - y_ref).max() / jnp.abs(y_ref).max())
    assert err < 1e-6, err


def test_dd_matvec_pallas_aligned_exact_rows():
    """P == q (no padding) and multiple row blocks (P > 512)."""
    rng = np.random.default_rng(1)
    n_sub, P = 2, 640
    A = rng.standard_normal((n_sub, P, P))
    hi, lo = dd_split(jnp.asarray(A))
    d = jnp.asarray(rng.standard_normal((n_sub, P)))
    y_ref = dd_matvec(hi, lo, d)
    y = dd_matvec_pallas(hi, lo, d, interpret=True)
    err = float(jnp.abs(y - y_ref).max() / jnp.abs(y_ref).max())
    assert err < 1e-6, err
