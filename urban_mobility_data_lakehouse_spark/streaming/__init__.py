from . import daily  # noqa: F401
