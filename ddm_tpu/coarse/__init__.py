from .basis import CoarseBasis, finalize_basis  # noqa: F401
from .pou_space import pou_coarse_space  # noqa: F401
