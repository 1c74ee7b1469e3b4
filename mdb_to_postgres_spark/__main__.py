"""CLI entry point — the reference tool's one-command migration UX
(``mdb-to-postgres <db> <target>``) re-expressed for this engine:

    python -m mdb_to_postgres_spark migrate --source /root/testdata/sf0.001 \\
        --dest /tmp/out [--tables region,nation] [--format parquet|orc|csv|jdbc]
    python -m mdb_to_postgres_spark schema  --source /root/testdata/sf0.001
    python -m mdb_to_postgres_spark tables  --source /root/testdata/sf0.001

``migrate`` runs the tier-R pipeline per table (typed scan -> identifier
sanitization -> sink); ``schema``/``tables`` are the introspection commands
(extract_schema / list_tables as console output). A JDBC dest takes a URL
(``--dest jdbc:derby:...``); file formats take a directory. The heavy
lifting stays in etl/pipeline.py and sources/jdbc.py — the CLI is argument
parsing plus a per-table loop over DataFrame writes (each write is a
distributed job; nothing rows through the driver).
"""

from __future__ import annotations

import argparse
import sys

from .session import get_session
from .sources.tables import TABLES, T


def _parse(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="mdb_to_postgres_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp: argparse.ArgumentParser) -> None:
        sp.add_argument("--source", required=True, help="sf dir of parquet tables")
        sp.add_argument("--tables", default=None, help="comma list (default: all)")

    mig = sub.add_parser("migrate", help="copy every table to the destination")
    common(mig)
    mig.add_argument("--dest", required=True, help="output dir or jdbc: URL")
    mig.add_argument(
        "--format", default="parquet", choices=["parquet", "orc", "csv", "jdbc"]
    )
    common(sub.add_parser("schema", help="print per-column types per table"))
    common(sub.add_parser("tables", help="list tables with row counts"))
    return p.parse_args(argv)


def _table_names(args: argparse.Namespace) -> list[str]:
    if args.tables:
        names = [t.strip() for t in args.tables.split(",") if t.strip()]
        unknown = sorted(set(names) - set(TABLES))
        if unknown:
            raise SystemExit(f"unknown tables: {unknown} (have: {TABLES})")
        return names
    return list(TABLES)


def main(argv: list[str] | None = None) -> int:
    args = _parse(sys.argv[1:] if argv is None else argv)
    spark = get_session("mdb-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    names = _table_names(args)

    if args.cmd == "tables":
        for t in names:
            df = T(spark, args.source, t)
            print(f"{t}\t{df.count()} rows\t{len(df.columns)} cols")
        return 0

    if args.cmd == "schema":
        for t in names:
            for f in T(spark, args.source, t).schema.fields:
                nullable = "NULL" if f.nullable else "NOT NULL"
                print(f"{t}.{f.name}\t{f.dataType.simpleString()}\t{nullable}")
        return 0

    # migrate
    from .etl.pipeline import full_table_copy

    fmt = args.format
    use_jdbc = fmt == "jdbc" or args.dest.startswith("jdbc:")
    for t in names:
        df = T(spark, args.source, t)
        if use_jdbc:
            from .sources.jdbc import write_table

            write_table(df, args.dest, t, mode="overwrite")
            print(f"migrated {t} -> {args.dest} (jdbc table {t})")
        else:
            dst = f"{args.dest.rstrip('/')}/{t}"
            full_table_copy(df, dst, fmt=fmt)
            print(f"migrated {t} -> {dst} ({fmt})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
