# Python analogue of the reference's poisson_coefficient.lua: scripted
# coefficients loaded at runtime via -coefficient_file (fem/scripted.py).
import jax.numpy as jnp


def g(x, y):
    return 1.0 - x


def f(x, y):
    return jnp.zeros_like(x)


def alpha(x, y):
    kappa = jnp.ones_like(x)
    kappa = jnp.where(
        (x > 0.3) & (x < 0.9) & (y > 0.6 - (x - 0.3) / 6)
        & (y < 0.8 - (x - 0.3) / 6),
        1e5 * (x + y) * 10.0, kappa)
    kappa = jnp.where(
        (x > 0.1) & (x < 0.5) & (y > 0.1 + x) & (y < 0.25 + x),
        1e5 * (1.0 + 7.0 * y), kappa)
    kappa = jnp.where(
        (x > 0.5) & (x < 0.9) & (y > 0.15 - (x - 0.5) * 0.25)
        & (y < 0.35 - (x - 0.5) * 0.25),
        1e5 * 2.5, kappa)
    ix = jnp.floor(15.0 * x).astype(jnp.int32)
    iy = jnp.floor(15.0 * y).astype(jnp.int32)
    kappa = jnp.where((ix % 2 == 0) & (iy % 2 == 0), 1e5 * (1.0 + ix + iy),
                      kappa)
    return kappa


def is_dirichlet(x, y):
    return (x < 1e-6) | (x > 1.0 - 1e-6)
