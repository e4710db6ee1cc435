"""DuckDB oracle comparator mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import datetime as dt
import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Round-tripped through both engines after explicit round() in the
        # query itself; 12 significant digits absorbs any residual ulp noise.
        return f"{v:.12g}"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def canonicalize(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)
    return sorted(cols), canon_rows


def compare(spark_df, oracle_sql_text: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d_cols, d_rows = run_duckdb(oracle_sql_text, sf_dir)

    problems: list[str] = []
    sc, sr = canonicalize(s_cols, s_rows)
    dc, dr = canonicalize(d_cols, d_rows)
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duckdb={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"row count differs: spark={len(sr)} duckdb={len(dr)}")
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            problems.append(f"row {i} differs:\n  spark : {a}\n  duckdb: {b}")
            if len(problems) > 5:
                problems.append("... (truncated)")
                break
    return problems
