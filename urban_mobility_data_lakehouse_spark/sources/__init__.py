from .matview import MaterializedView  # noqa: F401
from .testdata import TESTDATA_TABLES, load_table, load_tables  # noqa: F401
