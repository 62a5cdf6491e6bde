from . import loss  # noqa: F401
