"""Round-5 follow-up to unstr_spmv_probe_r4: tile-width and select-stage
variants of the tiled_take bandwidth gather for the general (unstructured)
ELL SpMV.

r4 result (lshape refine-4, n=94593, m=8): general 11.44 ms, tiled(128)
7.47 ms.  The tiled cost is dominated by the (m, n, tile) gather stream +
one-hot select passes; variants here shrink either the per-index stream
(tile width) or the select passes (two-stage select, f32 one-hot).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python scratch/unstr_spmv_probe2_r5.py
"""

import time

import numpy as np

import ddm_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from ddm_tpu.api import default_ptree, setup_problem
from ddm_tpu.fem import problems as pm
from ddm_tpu.fem.grids import refine
from ddm_tpu.fem.msh import read_msh

ITERS = 20

jnp.ones((8, 128)).block_until_ready()
print("init done", flush=True)

grid = read_msh("/root/reference/data/lshape.msh")
grid = refine(grid, 4)
pt = default_ptree()
p = setup_problem(pt, problem=pm.islands(), grid=grid, n_sub=8)
A = p.A
assert A.offsets is None
n = A.n
print(f"n={n} m={A.valsT.shape[0]}", flush=True)

key = jax.random.PRNGKey(0)
x0 = jax.random.normal(key, (n,), jnp.float64)
perturb = jax.random.normal(jax.random.PRNGKey(1), (ITERS, 8), jnp.float64)


def chain(body):
    def run(x):
        def step(i, carry):
            y = body(carry)
            return y + perturb[i, 0] * 1e-30 * y
        return jax.lax.fori_loop(0, ITERS, step, x)
    return jax.jit(run)


def take_tiled(xp, idx, tile):
    m = xp.shape[0]
    n_t = -(-m // tile)
    x2 = jnp.pad(xp, (0, n_t * tile - m)).reshape(n_t, tile)
    t = (idx // tile).astype(jnp.int32)
    l = (idx % tile).astype(jnp.int32)
    rows = x2[t]
    sel = (l[..., None] == jnp.arange(tile, dtype=jnp.int32)).astype(xp.dtype)
    return (rows * sel).sum(axis=-1)


def take_tiled_2stage(xp, idx, tile=128, g=16):
    m = xp.shape[0]
    n_t = -(-m // tile)
    x2 = jnp.pad(xp, (0, n_t * tile - m)).reshape(n_t, tile)
    t = (idx // tile).astype(jnp.int32)
    l = (idx % tile).astype(jnp.int32)
    rows = x2[t]  # (..., tile)
    s = tile // g
    r2 = rows.reshape(rows.shape[:-1] + (g, s))
    sel_g = (
        (l // s)[..., None] == jnp.arange(g, dtype=jnp.int32)
    ).astype(xp.dtype)
    small = jnp.einsum("...gs,...g->...s", r2, sel_g)
    sel_s = (
        (l % s)[..., None] == jnp.arange(s, dtype=jnp.int32)
    ).astype(xp.dtype)
    return (small * sel_s).sum(axis=-1)


def take_tiled_f32sel(xp, idx, tile=128):
    m = xp.shape[0]
    n_t = -(-m // tile)
    x2 = jnp.pad(xp, (0, n_t * tile - m)).reshape(n_t, tile)
    t = (idx // tile).astype(jnp.int32)
    l = (idx % tile).astype(jnp.int32)
    rows = x2[t]
    sel = (l[..., None] == jnp.arange(tile, dtype=jnp.int32)).astype(
        jnp.float32
    )
    return (rows * sel).sum(axis=-1)


def mv_with(take):
    def mv(x):
        xp = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
        return (A.valsT * take(xp, A.colsT)).sum(axis=0)
    return mv


def mv_general(x):
    xp = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
    return (A.valsT * xp[A.colsT]).sum(axis=0)


def measure(name, fn):
    f = chain(fn)
    y = f(x0)
    np.asarray(y[-1:])
    t0 = time.perf_counter()
    y = f(x0)
    np.asarray(y[-1:])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {name:<16} {dt * 1e3:8.2f} ms/SpMV", flush=True)
    return y

y_ref = measure("general", mv_general)
variants = {
    "tiled32": mv_with(lambda xp, i: take_tiled(xp, i, 32)),
    "tiled64": mv_with(lambda xp, i: take_tiled(xp, i, 64)),
    "tiled128": mv_with(lambda xp, i: take_tiled(xp, i, 128)),
    "tiled256": mv_with(lambda xp, i: take_tiled(xp, i, 256)),
    "2stage128x16": mv_with(lambda xp, i: take_tiled_2stage(xp, i, 128, 16)),
    "2stage128x8": mv_with(lambda xp, i: take_tiled_2stage(xp, i, 128, 8)),
    "2stage256x16": mv_with(lambda xp, i: take_tiled_2stage(xp, i, 256, 16)),
    "f32sel128": mv_with(lambda xp, i: take_tiled_f32sel(xp, i, 128)),
}
for name, fn in variants.items():
    y = measure(name, fn)
    err = float(jnp.abs(y - y_ref).max() / jnp.abs(y_ref).max())
    if err != 0.0:
        print(f"    !! {name} rel err {err:.2e}", flush=True)
# first-variant trap: re-measure
measure("general2", mv_general)
