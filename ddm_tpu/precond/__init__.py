from .schwarz import SchwarzPreconditioner, build_schwarz  # noqa: F401
from .extract import extract_subdomain_dense  # noqa: F401
