from . import exact, incremental, minhash, simhash  # noqa: F401
