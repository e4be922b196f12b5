from .logger import Logger, ScopedLog, logger, setup_loggers  # noqa: F401
