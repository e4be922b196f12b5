"""Host->device transfer helpers for the remote TPU backend.

Round-4 measured truth (scratch/setup_phases_r4.py, scratch/upload_probe_r4):
the 384^2 bench's ``Discretization.__init__`` spent 734 s on two uploads
totalling ~27 MB, while a same-process 18 MB *1-D* upload took ~7 s.  The
difference is layout: device arrays are tiled to (8, 128) vector tiles, and
an upload of a (n_e, 4, 2) f64 coordinate array moves the PADDED layout
through the tunnel — 4 -> 8 sublanes and 2 -> 128 lanes is a ~64x byte
inflation (the same tiling rule that makes tiny-minor-dim gathers slow,
CLAUDE.md round-2/3 indexing rules).

:func:`upload` therefore transfers every >=2-D host array FLAT (1-D, no
padding) and reshapes on device — the reshape is device-local HBM work.
This is a no-op semantically and harmless on CPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def upload(x, dtype=None) -> jnp.ndarray:
    """``jnp.asarray`` that moves host arrays to device WITHOUT tile-padding
    inflation: >=2-D arrays transfer as their flat 1-D buffer and are
    reshaped on device.  Device arrays and tracers pass through unchanged
    (apart from an optional dtype cast)."""
    if isinstance(x, jax.core.Tracer) or isinstance(x, jax.Array):
        a = x
        if dtype is not None and a.dtype != dtype:
            a = a.astype(dtype)
        return a
    a = np.asarray(x)
    if dtype is not None:
        a = a.astype(dtype, copy=False)
    if a.ndim <= 1 or (a.ndim == 2 and a.shape[-1] % 128 == 0):
        return jnp.asarray(a)
    flat = jnp.asarray(np.ascontiguousarray(a).reshape(-1))
    return flat.reshape(a.shape)
