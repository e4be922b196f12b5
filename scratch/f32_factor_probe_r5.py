"""r5: is the f32 triangular solve the dominant cost of the f32-Cholesky
seed (factorise) and the whitening stage (GEVP), and does the blocked
matmul tri-inv beat it in f32?

Shapes: the unstructured audit chunk (12, 1760, 1760) and the 2-D bench
chunk (52, 848, 848).

Timing: chained eager calls with value perturbation (memoization), hard
sync by device-slice fetch; first case re-measured last.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python scratch/f32_factor_probe_r5.py
"""

import time

import numpy as np

import ddm_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from ddm_tpu.solvers.direct import batched_tri_lower_inv

jnp.ones((8, 128)).block_until_ready()
print("init", flush=True)

REPS = 3


def sync(x):
    np.asarray(jax.device_get(x[..., -1:, -1:]))


def timed(name, fn, arg):
    out = None
    ts = []
    for r in range(REPS):
        a = arg + (1e-30 * r) * arg  # defeat value memoization
        t0 = time.perf_counter()
        out = fn(a)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {name:<28} {min(ts[1:]):8.3f} s (runs {[f'{t:.3f}' for t in ts]})",
          flush=True)
    return out


for (b, p) in ((12, 1760), (52, 848)):
    print(f"shape ({b}, {p}, {p}):", flush=True)
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((b, p, p)) / np.sqrt(p)
    A = (Q @ Q.transpose(0, 2, 1) + 2.0 * np.eye(p)).astype(np.float32)
    A32 = jnp.asarray(A)

    chol = jax.jit(jnp.linalg.cholesky)
    L32 = timed("f32 cholesky", chol, A32)

    eye32 = jnp.broadcast_to(jnp.eye(p, dtype=jnp.float32), A32.shape)
    tsolve = jax.jit(lambda L: jax.lax.linalg.triangular_solve(
        L, eye32, left_side=True, lower=True))
    Li_a = timed("lax tri-solve (f32)", tsolve, L32)

    for nb in (64, 128):
        binv = jax.jit(lambda L, nb=nb: batched_tri_lower_inv(L, nb=nb))
        Li_b = timed(f"blocked tri-inv nb={nb} (f32)", binv, L32)
    err = float(jnp.max(jnp.abs(Li_a - Li_b)) / jnp.max(jnp.abs(Li_a)))
    print(f"  agreement lax-vs-blocked: {err:.2e}", flush=True)
    timed("f32 cholesky (re)", chol, A32)
