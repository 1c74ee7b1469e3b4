"""Sources & sinks (SURVEY.md §2.1): parquet, CSV, JDBC."""

from .tables import T, TABLES, load_tables  # noqa: F401
