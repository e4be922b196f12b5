from .params import EigensolverParams  # noqa: F401
from .dense_gevp import solve_gevp_dense  # noqa: F401
