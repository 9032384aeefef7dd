#!/usr/bin/env python3
"""Whole-result compare for results too large for the pandas path.

tools/check_oracle.py mirrors the driver byte-for-byte but materializes
every row as Python strings — ~100 GB for a 180M-row result at sf30. This
fallback keeps the comparison INSIDE DuckDB: both sides (the Spark result
parquet and the oracle SQL) are canonicalized identically — columns
sorted by name, each cell CAST AS VARCHAR with NULL spelled out — and
reduced to (row count, SUM(hash(row)) over the multiset). Equality of the
pair proves multiset equality up to 64-bit hash-sum collisions; because
ONE engine performs both stringifications, the dtype-spelling hazards the
pandas path polices (R9a/R9b) cannot split the sides here, so this is a
VALUE comparison, not a rendering comparison. Use it only where the
pandas path is documented infeasible; the graded gate stays
check_oracle.py.

Usage: python3 tools/check_oracle_big.py <sfDir> <verifyOutDir> <query ...>
"""
import json
import os
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_expr(con, rel_sql: str) -> str:
    # Escape the join delimiter inside each cell ('\'->'\\', '|'->'\|') so
    # ('a|b','c') and ('a','b|c') cannot canonicalize identically.
    cols = [r[0] for r in con.execute(f"DESCRIBE {rel_sql}").fetchall()]
    cells = ", ".join(
        "replace(replace(COALESCE(CAST(\"%s\" AS VARCHAR), 'NULL'),"
        " '\\', '\\\\'), '|', '\\|')" % c for c in sorted(cols))
    return f"concat_ws('|', {cells})"


def digest(con, rel_sql: str):
    e = canon_expr(con, rel_sql)
    return con.execute(
        f"WITH __r AS ({rel_sql}) SELECT COUNT(*), "
        f"CAST(SUM(CAST(hash({e}) AS HUGEINT)) AS VARCHAR) FROM __r"
    ).fetchone()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    lim = os.environ.get("GRAFT_DUCKDB_MEMLIMIT")
    if lim:
        con.execute(f"SET memory_limit = '{lim}'")
        con.execute("SET preserve_insertion_order = false")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name in names:
        res = Path(out_dir) / name
        if not res.exists():
            print(f"MISS  {name}")
            n_bad += 1
            continue
        try:
            sn, sh = digest(con, f"SELECT * FROM read_parquet('{res}/*.parquet')")
            on, oh = digest(con, oracle[name])
            if sn == on and sh == oh:
                print(f"OK    {name} ({sn} rows, hashsum match)")
                n_ok += 1
            else:
                print(f"BAD   {name}: spark=({sn},{sh}) oracle=({on},{oh})")
                n_bad += 1
        except Exception as e:  # surface, keep going
            print(f"ERR   {name}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
