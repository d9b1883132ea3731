from . import losses, metrics  # noqa: F401
