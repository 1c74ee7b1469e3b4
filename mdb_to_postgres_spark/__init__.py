"""mdb_to_postgres_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL project ``patricksanders/mdb-to-postgres``
(an Access/JET -> PostgreSQL batch copy pipeline; see SURVEY.md §0 — the
reference checkout was empty, so semantics derive from the public mdbtools /
JET / Postgres behavior it reproduces), plus a relational query tier and
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns), all expressed with the DataFrame/SQL API so Catalyst,
AQE and whole-stage codegen do the physical planning.

Layout
------
- ``session``     : configured SparkSession factory (AQE, Arrow, tunables)
- ``registry``    : the query/oracle registry backing ``__spark_entry__``
- ``sources``     : parquet/CSV/JDBC readers and sinks (tier R scans/sinks)
- ``etl``         : JET->Postgres type map, sanitization, copy pipeline (tier R)
- ``operators``   : relational operators — joins, aggregates, windows, setops
- ``functions``   : scalar function families + decimal-exact compat helpers
- ``streaming``   : Structured Streaming ops + batch-equivalent forms
- ``extensions``  : dedup / similarity / text-analysis / multimodal / UDF tier
- ``plans``       : plan inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
