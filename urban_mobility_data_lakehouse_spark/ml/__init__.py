from .clustering import typical_day_clustering  # noqa: F401
