# Python port of the reference's
# symmetric_convection_diffusion_coefficient.lua
# (/root/reference/examples/symmetric_convection_diffusion_coefficient.lua:1-15):
# unit diffusion, unit source, Dirichlet on the left (x = 0) and top
# (y = 1) edges — the symmetrized variant used with
# problem_type = symmetric.  Loaded via -coefficient_file (fem/scripted.py
# adapts the per-point (x, y) signatures into vectorized jnp kernels).
import jax.numpy as jnp


def alpha(x, y):
    return jnp.ones_like(x)


def f(x, y):
    return jnp.ones_like(x)


def is_dirichlet(x, y):
    return (jnp.abs(x) < 1e-6) | (jnp.abs(1.0 - y) < 1e-6)


def g(x, y):
    return jnp.zeros_like(x)
