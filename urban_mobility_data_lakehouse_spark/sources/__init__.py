from .testdata import TESTDATA_TABLES, load_table, load_tables  # noqa: F401
