from . import ivf, knn, persistent_ivf  # noqa: F401
