from .tables import TPCH_TABLES, load_table, read_pages  # noqa: F401
