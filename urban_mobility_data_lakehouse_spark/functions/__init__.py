from . import cleaning, datetime_fns, spatial  # noqa: F401
