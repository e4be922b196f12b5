from .ddmatvec import dd_matvec_pallas  # noqa: F401
