from .sparse import SparseELL, EllPattern  # noqa: F401
