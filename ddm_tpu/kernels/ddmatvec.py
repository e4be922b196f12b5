"""Pallas TPU kernel: fused double-single (dd) batched matvec.

The dd apply path (solvers/direct.py:BatchedInverseDD, reference analogue:
the UMFPACK multi-RHS resolve, dune/ddm/eigensolvers/umfpack.hh:132-251)
computes y = (hi + lo) @ d with the subdomain inverse stored as an f32
(hi, lo) pair.  The XLA formulation is three separate narrow matmuls:
each pads the single RHS lane to 128 on the MXU (~99% wasted lanes) and
streams ``hi`` from HBM twice.  This kernel fuses all three products into
one pass over (hi, lo) — each matrix tile is read from HBM exactly once,
and the products run on the VPU as multiply + lane-reduction, which is the
right unit for a bandwidth-bound matvec.

Layout contract: hi/lo are (n_sub, P, P) with P a multiple of 128 and
zero padding beyond the logical size (zero rows/cols keep padded outputs
exactly zero).  d may be any (n_sub, q<=P); it is zero-padded to P and the
result sliced back.

The two f32 partial sums (y0 = hi@dh, y1 = lo@dh + hi@dl) are combined to
f64 OUTSIDE the kernel (Pallas TPU has no f64) — identical math to
solvers/direct.py:dd_matvec.

MEASURED VERDICT (v5e-1, (256,896,896), memoization-proof chained timing):
this kernel 74 ms/apply vs XLA's three-narrow-matmul formulation at
1.3 ms/apply — XLA already fuses the dd products into a bandwidth-class
pass, while the one-subdomain-per-grid-step VPU-reduction formulation here
under-utilizes the DMA pipeline ~50x.  The kernel is therefore NOT wired
into the apply path; it stays as the measured reference point that
justifies the XLA formulation (and as the scaffold if a future backend
shifts the balance).  Hot ops on this backend are either f64
(Pallas-unsupported; XLA-emulated) or already at the HBM/MXU roofline
after the transposed-ELL/gather-dual layout work — there is no honest
Pallas win on this workload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend params are only importable with a TPU jaxlib
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover - CPU-only environments
    _VMEM = None


def _kernel(hi_ref, lo_ref, dh_ref, dl_ref, y0_ref, y1_ref):
    hi = hi_ref[0]  # (RB, P) f32
    lo = lo_ref[0]
    dh = dh_ref[0]  # (1, P) f32 — vectors carried 3D for TPU tiling rules
    dl = dl_ref[0]
    # bandwidth-bound: one read of hi and lo per output row block; VPU
    # multiply + lane reduction (MXU would pad the 1-lane RHS 128x)
    y0_ref[0, 0, :] = jnp.sum(hi * dh, axis=1)
    y1_ref[0, 0, :] = jnp.sum(lo * dh + hi * dl, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dd_matvec_pallas(
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    d: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = (hi + lo) @ d, one HBM pass over hi/lo.

    hi, lo: (n_sub, P, P) f32, P % 128 == 0, zero-padded.
    d: (n_sub, q) f64 with q <= P.  Returns (n_sub, q) f64.
    """
    n_sub, P, _ = hi.shape
    q = d.shape[1]
    if P % 128:
        raise ValueError(f"dd_matvec_pallas needs 128-aligned storage, got {P}")
    dh = d.astype(jnp.float32)
    dl = (d - dh.astype(jnp.float64)).astype(jnp.float32)
    if q != P:
        pad = ((0, 0), (0, P - q))
        dh = jnp.pad(dh, pad)
        dl = jnp.pad(dl, pad)
    # vectors carried as (n_sub, 1, P): TPU block tiling requires the last
    # two block dims to be (mult of 8 | equal, mult of 128 | equal)
    dh = dh[:, None, :]
    dl = dl[:, None, :]

    RB = min(P, 512)  # row block: bounds VMEM to ~2x RB*P*4 bytes
    n_rb = P // RB if P % RB == 0 else -(-P // RB)
    mem = {} if (_VMEM is None or interpret) else {"memory_space": _VMEM}
    # NOTE: zeros in index maps are written s*0 / r*0 (i32) — with
    # jax_enable_x64 a literal 0 traces as i64 and Mosaic fails to
    # legalize the mixed-width index tuple ("failed to legalize func.return")
    in_specs = [
        pl.BlockSpec((1, RB, P), lambda s, r: (s, r, r * 0), **mem),
        pl.BlockSpec((1, RB, P), lambda s, r: (s, r, r * 0), **mem),
        pl.BlockSpec((1, 1, P), lambda s, r: (s, r * 0, r * 0), **mem),
        pl.BlockSpec((1, 1, P), lambda s, r: (s, r * 0, r * 0), **mem),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, RB), lambda s, r: (s, r * 0, r), **mem),
        pl.BlockSpec((1, 1, RB), lambda s, r: (s, r * 0, r), **mem),
    ]
    y0, y1 = pl.pallas_call(
        _kernel,
        grid=(n_sub, n_rb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_sub, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((n_sub, 1, P), jnp.float32),
        ],
        interpret=interpret,
    )(hi, lo, dh, dl)
    y = y0[:, 0, :].astype(jnp.float64) + y1[:, 0, :].astype(jnp.float64)
    return y[:, :q]
