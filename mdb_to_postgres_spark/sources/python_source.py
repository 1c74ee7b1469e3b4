"""Custom connector via the Python Data Source API (Spark 4, SURVEY §2.1
cont.): the extension point for "every source a user might have" when no
built-in or JVM connector exists — REST endpoints, bespoke binary logs,
internal services. The contract demonstrated here is the one that matters
at 100 TB: ``partitions()`` declares the split set and each task calls
``read(partition)`` for ITS split only, so ingest parallelism is the
source's own partitioning, not a single-threaded driver loop.

The demo source generates a deterministic keyed feed (md5-derived values,
no RNG) so the whole connector path — registration, option passing,
partition planning, per-partition reads — is oracle-checkable: DuckDB
reproduces the same rows from range() + md5.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query

_ROWS = 4096
_PARTS = 8


class _SynthPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", _ROWS))
        self.parts = int(options.get("parts", _PARTS))

    def partitions(self):
        per = self.rows // self.parts
        return [
            _SynthPartition(i, i * per, (i + 1) * per if i < self.parts - 1 else self.rows)
            for i in range(self.parts)
        ]

    def read(self, partition):
        # Runs in the executor task for THIS split only.
        for i in range(partition.start, partition.end):
            yield (i, partition.index, hashlib.md5(str(i).encode()).hexdigest()[:8])


class SynthFeedSource(DataSource):
    """spark.read.format("graft_synth").option("rows", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "graft_synth"

    def schema(self) -> str:
        return "id bigint, pid int, val string"

    def reader(self, schema):
        return _SynthReader(self.options)


_REGISTERED: set[str] = set()


def _ensure_registered(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(SynthFeedSource)
        _REGISTERED.add(app)


@query(
    "scan_python_datasource",
    oracle=f"""
    SELECT i AS id,
           CAST(i // {_ROWS // _PARTS} AS INTEGER) AS pid,
           substr(md5(CAST(i AS VARCHAR)), 1, 8) AS val
    FROM range({_ROWS}) t(i)
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source scan (#7 cont.): a registered
    ``graft_synth`` connector read through the normal
    ``spark.read.format(...)`` path. 8 declared input partitions each
    produce their own slice executor-side — the partition-parallel
    connector contract — and the md5-derived payload hash-checks against
    DuckDB's reproduction, covering registration, option passing,
    partition planning, and per-partition reads end-to-end."""
    _ensure_registered(spark)
    return (
        spark.read.format("graft_synth")
        .option("rows", _ROWS)
        .option("parts", _PARTS)
        .load()
    )
