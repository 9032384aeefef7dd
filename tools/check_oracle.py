#!/usr/bin/env python3
"""Dev-time self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views over the
<sfDir> parquet tables, sorts columns by name on both sides, stringifies
values, and reports per-query match/mismatch.

NOT part of the engine — local test tooling only (the engine is pure Scala
Spark; this mirrors what the driver's harness does so oracle SQL dialect
bugs surface before a graded round).
"""
import decimal
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    # array cells first: `v != v` is ambiguous on ndarrays
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if v is None or v != v:  # None or NaN
        return "NULL"
    if isinstance(v, float):
        # pandas turns nullable int64 parquet columns into float64; undo it
        # so both sides stringify identically (exact below 2^53)
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.6f}"
    return str(v)


def risky_output_types(res_dir: Path) -> list:
    """Strict gate (round-1 lesson): the driver's hash-compare stringifies
    DECIMAL and FLOAT columns differently per engine (DuckDB-pandas
    '253942.0' vs Spark parquet Decimal '253942.000000'), so a graded query
    must NEVER emit them — micro-scaled BIGINT (*_e6) is the convention.
    Returns [(col, type)] offenders found in the Spark result parquet."""
    bad = []
    files = sorted(res_dir.glob("*.parquet"))
    if not files:
        return bad
    schema = pq.read_schema(files[0])
    for field in schema:
        t = str(field.type)
        if t.startswith("decimal") or t in ("float", "double", "halffloat"):
            bad.append((field.name, t))
    return bad


def duck_risky_cells(duck_df: pd.DataFrame) -> list:
    """Mirror gate on the oracle side: Decimal/float cells would stringify
    engine-dependently in the driver. (fetchall keeps DuckDB DECIMALs as
    decimal.Decimal objects — exactly the values to refuse.) STRICT on
    floats: even an integral DOUBLE (e.g. DuckDB round() yields DOUBLE) is
    rejected, because the driver's pandas path renders it '5.0' against
    Spark's BIGINT '5' — norm_cell's collapsing would mask that here."""
    bad = []
    for c in duck_df.columns:
        for v in duck_df[c].head(200):
            if isinstance(v, decimal.Decimal):
                bad.append((c, "decimal"))
                break
            if isinstance(v, float) and v == v:
                bad.append((c, "float"))
                break
    return bad


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    only = set(sys.argv[3:])
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISS  {name}: no Spark result dir")
            n_bad += 1
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(res_dir.glob("*.parquet"))],
                ignore_index=True)
        except ValueError:
            print(f"MISS  {name}: empty Spark result dir")
            n_bad += 1
            continue
        try:
            # fetchall (not .df()) so wide DECIMALs stay exact Decimals —
            # pandas converts DuckDB decimals to lossy float64.
            cur = con.execute(sql)
            duck_cols = [c[0] for c in cur.description]
            duck_df = pd.DataFrame(cur.fetchall(), columns=duck_cols, dtype=object)
        except Exception as e:
            print(f"SQLERR {name}: {e}")
            n_bad += 1
            continue
        risky = risky_output_types(res_dir) + duck_risky_cells(duck_df)
        if risky:
            print(f"TYPE  {name}: driver-unsafe output columns {risky} "
                  f"(emit *_e6 BIGINT instead)")
            n_bad += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"SCHEMA {name}: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
            n_bad += 1
        elif len(s) != len(d):
            print(f"ROWS  {name}: spark={len(s)} duck={len(d)}")
            n_bad += 1
        elif s != d:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b][:3]
            print(f"HASH  {name}: {len([1 for a, b in zip(s, d) if a != b])} differing rows; first: {diffs}")
            n_bad += 1
        else:
            print(f"OK    {name} ({len(s)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
