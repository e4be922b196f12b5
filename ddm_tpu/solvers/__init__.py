from .direct import BatchedCholesky, BatchedLU, factor_batched  # noqa: F401
from .krylov import cg_solve  # noqa: F401
