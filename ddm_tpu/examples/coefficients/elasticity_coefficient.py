# Python port of the reference's coefficient.lua
# (/root/reference/examples/coefficient.lua:1-72): steel-reinforced rubber —
# a 2x4 pattern of cylindrical steel bars (E=2e11, nu=0.3) along x in [0,3]
# inside a rubber bar (E=2e7, nu=0.45), clamped at x=0.  Loaded via
# -coefficient_file (fem/scripted.py:load_elasticity_problem derives the
# Lame parameters lam/mu from youngs_modulus/poisson_ratio exactly as the
# lua script does).
import jax.numpy as jnp

BAR_RADIUS = 0.04
BAR_START_X = 0.0
BAR_END_X = 3.0
BAR_POSITIONS_Y = jnp.array([0.25, 0.75])
BAR_POSITIONS_Z = jnp.array([0.3, 0.6, 0.9, 1.2])

STEEL_YOUNGS_MODULUS = 2e11
STEEL_POISSON_RATIO = 0.3
RUBBER_YOUNGS_MODULUS = 2e7
RUBBER_POISSON_RATIO = 0.45


def _is_inside_steel_bar(x, y, z):
    d2 = (y[..., None, None] - BAR_POSITIONS_Y[:, None]) ** 2 + (
        z[..., None, None] - BAR_POSITIONS_Z[None, :]
    ) ** 2
    inside_r = (d2 <= BAR_RADIUS**2).any(axis=(-2, -1))
    return inside_r & (x >= BAR_START_X) & (x <= BAR_END_X)


def youngs_modulus(x, y, z):
    return jnp.where(_is_inside_steel_bar(x, y, z),
                     STEEL_YOUNGS_MODULUS, RUBBER_YOUNGS_MODULUS)


def poisson_ratio(x, y, z):
    return jnp.where(_is_inside_steel_bar(x, y, z),
                     STEEL_POISSON_RATIO, RUBBER_POISSON_RATIO)


def is_dirichlet(x, y, z):
    return x < 1e-9
