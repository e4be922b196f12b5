# Python port of the reference's convection_diffusion_coefficient.lua
# (/root/reference/examples/convection_diffusion_coefficient.lua:1-40):
# 8x8 checkerboard diffusion (1e-6 / 1), constant wind b = (1/3, 1),
# inflow Dirichlet on the left/bottom edges, g = 1 on the left edge.
# Loaded via -coefficient_file (fem/scripted.py adapts the per-point
# (x, y) signatures into vectorized jnp kernels).
import jax.numpy as jnp


def alpha(x, y):
    nx, ny = 8, 8
    a1, a2 = 1e-6, 1.0
    ix = jnp.floor(x * nx).astype(jnp.int32)
    iy = jnp.floor(y * ny).astype(jnp.int32)
    return jnp.where(ix % 2 == iy % 2, a2, a1)


def f(x, y):
    return jnp.zeros_like(x)


def is_dirichlet(x, y):
    return (x < 1e-6) | (y < 1e-6)


def b1(x, y):
    return jnp.full_like(x, 1.0 / 3.0)


def b2(x, y):
    return jnp.ones_like(x)


def g(x, y):
    return jnp.where(x < 1e-6, 1.0, 0.0)
