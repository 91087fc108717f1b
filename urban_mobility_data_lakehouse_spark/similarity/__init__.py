from . import ivf, knn, persistent_ivf, pq  # noqa: F401
