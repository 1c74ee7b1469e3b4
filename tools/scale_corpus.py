#!/usr/bin/env python
"""Generate a K-times-larger bench corpus ("sf1" = 10 x sf0.1) by
replicating the driver's sf0.1 tables with disjoint key ranges — the
second bench scale point BASELINE.md's scaling curve needs (sf0.1 is
overhead-bound; a 10x point shows which tiers actually scale with data).

Replication preserves the generator's value distributions and join
fan-outs exactly: every copy i offsets each table's surrogate keys by
i * OFFSET[table], and child tables use their PARENT's offset for foreign
keys, so per-copy referential structure is identical to sf0.1. Offsets
are powers of 10 (multiples of every modulus the queries use, e.g.
doc_id % 50 eval split), so modulo-derived distributions are unchanged.
Copy 0 is byte-identical to sf0.1 (vec_id 0, the fixed ANN query vector,
exists exactly once). Document text gets a per-copy CONTENT-WORD suffix
(word -> word{i}) so near-dup structure stays realistic: suffixing is a
token bijection within each copy, so within-copy shingle/Jaccard/minhash
structure is EXACTLY that of sf0.1 (dup rates scale linearly), while
cross-copy word-trigram sharing collapses to trigrams made only of the
7 kept lexicon words (~1% of positions). A bare trailing " v{i}" suffix
is NOT enough — it leaves ~96% of each doc's trigrams shared with its 9
clones, turning every doc into a near-dup clique and growing the
dedup-tier candidate-pair stream ~100x (quadratic) instead of ~10x;
measured as 13-800 s outliers across the shingle-index queries on the
first sf1 bench attempt. Lexicon words referenced by query constants
(_LANG_MARKERS en, _STOPWORDS, _BM25_TERMS: the, a, fast, slow, hash,
join, filter) keep their per-copy match rates by staying unsuffixed.
n_chars is recomputed to keep the n_chars == length(text) invariant.

Deterministic (pure arithmetic on the driver's seed=42 tables, no RNG).
Output: /root/repo/.cache/sf1/*.parquet (gitignored, ~10x sf0.1 bytes).
Usage: python tools/scale_corpus.py [K] [--out DIR] [--tables a,b,c]
(default K=10, out .cache/sf1, all tables). --tables restricts emission
to the named tables (e.g. documents,embeddings for a 100x dedup-tier
smoke — key offsets are per-copy multiples, collision-free up to K~100).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "sf1"
)

# Per-table key offsets (power of 10 above the table's max key).
OFF = {
    "customer": 10**6,
    "supplier": 10**4,
    "part": 10**6,
    "orders": 10**7,
    "events": 10**6,  # event_id; user_id uses 10**4 (max 1499)
    "documents": 10**4,
    "embeddings": 10**4,
}
USER_OFF = 10**4


def main() -> None:
    global OUT
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--tables" in args:
        i = args.index("--tables")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        OUT = os.path.abspath(args[i + 1])
        del args[i : i + 2]
    k = int(args[0]) if args else 10
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({k})) AS i")

    def emit(name: str, select: str) -> None:
        """Write {name}.parquet as a DIRECTORY of one file per copy —
        Spark reads it transparently, and a 10x corpus with 10x files is
        the representative layout: a single giant file would pin every
        compute-bound projection to one core locally (maxPartitionBytes
        never splits these ~15 MB tables) and misstate how a real
        replicated corpus scans."""
        if only is not None and name not in only:
            return
        path = os.path.join(OUT, f"{name}.parquet")
        if os.path.isfile(path):  # leftover single-file layout
            os.remove(path)
        os.makedirs(path, exist_ok=True)
        for i in range(k):
            con.execute(
                f"COPY (SELECT * EXCLUDE (__copy) FROM ({select}) WHERE __copy = {i}) TO "
                f"'{path}/copy{i:02d}.parquet' (FORMAT parquet, COMPRESSION zstd)"
            )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}/*.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows -> {path}")

    def emit_single(name: str, select: str) -> None:
        if only is not None and name not in only:
            return
        path = os.path.join(OUT, f"{name}.parquet")
        con.execute(f"COPY ({select}) TO '{path}' (FORMAT parquet, COMPRESSION zstd)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        print(f"{name}: {n} rows -> {path}")

    # Fixed dimensions: not scaled (TPC-H semantics).
    for t in ("region", "nation"):
        emit_single(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

    emit(
        "customer",
        f"""SELECT c_custkey + i*{OFF['customer']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment, i AS __copy
            FROM read_parquet('{SRC}/customer.parquet'), copies""",
    )
    emit(
        "supplier",
        f"""SELECT s_suppkey + i*{OFF['supplier']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal, i AS __copy
            FROM read_parquet('{SRC}/supplier.parquet'), copies""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + i*{OFF['part']} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice, i AS __copy
            FROM read_parquet('{SRC}/part.parquet'), copies""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + i*{OFF['orders']} AS o_orderkey,
                   o_custkey + i*{OFF['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
                   i AS __copy
            FROM read_parquet('{SRC}/orders.parquet'), copies""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + i*{OFF['orders']} AS l_orderkey,
                   l_partkey + i*{OFF['part']} AS l_partkey,
                   l_suppkey + i*{OFF['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate, i AS __copy
            FROM read_parquet('{SRC}/lineitem.parquet'), copies""",
    )
    emit(
        "events",
        f"""SELECT event_id + i*{OFF['events']} AS event_id, ts,
                   user_id + i*{USER_OFF} AS user_id, event_type, value, props, i AS __copy
            FROM read_parquet('{SRC}/events.parquet'), copies""",
    )
    # Words kept verbatim across copies: every word a query-side lexicon
    # constant matches against (see module docstring). Everything else is
    # suffixed with the copy index, decorrelating cross-copy shingles.
    keep = "('the', 'a', 'fast', 'slow', 'hash', 'join', 'filter', '')"
    emit(
        "documents",
        f"""SELECT doc_id + i*{OFF['documents']} AS doc_id, text,
                   lang, source, CAST(length(text) AS BIGINT) AS n_chars,
                   i AS __copy
            FROM (
              SELECT doc_id, i, lang, source,
                     CASE WHEN i = 0 THEN text
                          ELSE array_to_string(
                                 list_transform(
                                   string_split(text, ' '),
                                   w -> CASE WHEN w IN {keep} THEN w
                                             ELSE w || CAST(i AS VARCHAR) END),
                                 ' ')
                     END AS text
              FROM read_parquet('{SRC}/documents.parquet'), copies
            )""",
    )
    emit(
        "embeddings",
        f"""SELECT vec_id + i*{OFF['embeddings']} AS vec_id, embedding, label,
                   i AS __copy
            FROM read_parquet('{SRC}/embeddings.parquet'), copies""",
    )


if __name__ == "__main__":
    main()
