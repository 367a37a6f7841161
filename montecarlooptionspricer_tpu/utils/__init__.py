from .logging_utils import setup_logging  # noqa: F401
