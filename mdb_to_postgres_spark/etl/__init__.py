"""Tier R — the reference's own ETL surface (SURVEY.md §2.1-2.2, §3.1).

The reference is a single-node Access(JET) -> PostgreSQL copy pipeline
(mdb-tables / mdb-schema / mdb-export -> psql). Here that whole lifecycle is
~5 declarative DataFrame calls, distributed by Spark:

    scan -> cast_types -> project_rename -> null_normalize -> sink
"""

from .typemap import JET_TO_SPARK, JET_TO_POSTGRES, sanitize_identifier  # noqa: F401
from .pipeline import cast_frame, null_normalize, project_rename, full_table_copy  # noqa: F401
