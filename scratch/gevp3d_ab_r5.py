"""VERDICT r4 item 8: the 3-D GEVP pipeline decision at (24, 1000, 1000)
— one chunk of the 3-D bench's GEVP shape — measured as an A/B of the
three candidate pipelines.  Synthetic SPD pencils (device-generated):
pipeline wall-clock at these shapes is matmul/eigh/chol-bound, i.e.
shape-dependent, so the timing transfers; eigenvalue QUALITY claims come
from the real-pencil tests/audits, not from here.

  staged (prod) : probe whitener + thin-S + subspace seed + f64 refine
  whiten=chol   : classic f64 Cholesky + blocked tri-inv whitener
  seed=eigh     : full f32 eigh instead of the randomized subspace seed

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python scratch/gevp3d_ab_r5.py
"""

import dataclasses
import time

import numpy as np

import ddm_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from ddm_tpu.eigen import solve_gevp
from ddm_tpu.eigen.params import EigensolverParams

jnp.ones((8, 128)).block_until_ready()
print("init", flush=True)

B, P = 24, 1000
key = jax.random.PRNGKey(0)


@jax.jit
def make_pencil(key):
    k1, k2, k3 = jax.random.split(key, 3)
    R = jax.random.normal(k1, (B, P, P), jnp.float64) / np.sqrt(P)
    # heterogeneous scaling (contrast-like dynamic range)
    d = 10.0 ** jax.random.uniform(k2, (B, P), jnp.float64, -3, 0)
    A = jnp.einsum("spq,srq->spr", R, R) + 1e-6 * jnp.eye(P)[None]
    A = d[:, :, None] * A * d[:, None, :]
    w = jax.random.uniform(k3, (B, P), jnp.float64, 0.0, 1.0)
    C = A * w[:, :, None] * w[:, None, :] + 1e-8 * jnp.eye(P)[None]
    return 0.5 * (A + jnp.swapaxes(A, 1, 2)), 0.5 * (C + jnp.swapaxes(C, 1, 2))


A, C = make_pencil(key)
jax.block_until_ready(A)
base = EigensolverParams(nev=8, threshold=-1.0)


def timed(name, params):
    ts, out = [], None
    for r in range(3):
        Ar = A + (1e-30 * r) * A  # defeat value memoization
        t0 = time.perf_counter()
        out = solve_gevp(Ar, C, params, spd=True)
        np.asarray(jax.device_get(out[0][..., -1:]))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:<22} {min(ts[1:]):7.3f} s/chunk "
          f"(x22 chunks -> {22 * min(ts[1:]):6.1f} s at bench scale) "
          f"runs {[f'{t:.2f}' for t in ts]}", flush=True)
    return out


lam_s, _, _ = timed("staged(prod)", base)
lam_c, _, _ = timed("whiten=chol", dataclasses.replace(base, whiten="chol"))
timed("seed=eigh", dataclasses.replace(base, seed_mode="eigh"))
err = float(jnp.max(jnp.abs(lam_s - lam_c) / (jnp.abs(lam_c) + 1e-30)))
print(f"  staged-vs-chol lam rel diff: {err:.2e}", flush=True)
timed("staged(prod) re", base)
