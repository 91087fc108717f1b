from . import components, exact, incremental, minhash, simhash  # noqa: F401
