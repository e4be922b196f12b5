from .grids import Grid, structured_grid  # noqa: F401
from .msh import read_msh  # noqa: F401
