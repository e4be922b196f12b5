"""ddm_tpu — a TPU-native domain-decomposition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the DUNE module
``dune-ddm`` (overlapping Schwarz preconditioners with spectral coarse spaces
for FEM discretizations).  See SURVEY.md at the repository root for the layer
map of the reference and the architecture of this rebuild.

Design (TPU-first, not a port):

* One *subdomain per MPI rank* in the reference becomes a **batch dimension
  over subdomains**, sharded over a ``jax.sharding.Mesh`` axis.  All
  per-subdomain work (Schwarz solves, eigenproblems, extensions) runs as one
  batched device op instead of per-rank sequential code.
* DUNE's parallel index sets / overlap-extension MPI rounds
  (reference: dune/ddm/overlap_extension.hh, datahandles.hh) become
  **host-precomputed static int32 index maps** (core/indexmaps.py).
* Sparse direct subdomain solvers (UMFPACK/CHOLMOD) become **batched dense
  factorizations** of padded subdomain matrices (solvers/direct.py).
* Spectra's shift-invert Lanczos GEVP (dune/ddm/eigensolvers/spectra.hh)
  becomes a **batched dense/LOBPCG generalized eigensolver** (eigen/).
* MPI halo exchange and rank-0 coarse solves become gathers/scatter-adds and
  replicated dense coarse solves expressed inside one ``jit``.

Float64 is enabled by default (required for iteration-count parity with the
ISTL solvers at reductions of 1e-8..1e-10).  Set the environment variable
``DDM_TPU_X64=0`` before import to opt out.
"""

import os as _os

import jax as _jax

if _os.environ.get("DDM_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# persistent compilation cache: TPU compiles go through a slow remote-compile
# service here; caching across processes cuts re-runs from minutes to seconds
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = _os.path.expanduser("~/.cache/ddm_tpu_jax")
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    # cache EVERYTHING: the r5 compile-bill measurement
    # (scratch/compile_count_r5.py) found the cold bench bill is ~550 tiny
    # EAGER op compiles (broadcast_in_dim x96, dynamic_slice x56, ...)
    # totalling ~250 of 305 s — each under the old 1.0 s threshold, so
    # every fresh process recompiled all of them through the remote
    # tunnel.  Disk cost is negligible (KB-class entries).
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

__version__ = "0.1.0"
