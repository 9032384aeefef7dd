#!/usr/bin/env python3
"""sf30-scale compare for the IVF-family oracles (chunked, exact).

These oracles replay the engine's IVF pipeline exactly; their only scale
problem is a handful of list-carrying fanouts (training assignment `ta`,
vector->group `vg`, vector->fine `vf`, and for IVF-PQ the codebook
assignment `bta` and the 1.2B-pair code assignment `codes`) that DuckDB
materializes whole under a row_number window — tens to hundreds of GB of
temp at 600k x 64d, past this box's disk. The row_number in every one of
them PARTITIONS BY the vector id, so evaluating the fanout per vec_id
slice is semantically identical: this driver materializes each CTE of the
oracle IN DECLARATION ORDER as a real table, slicing exactly the heavy
ones over `vec_id % K`, then runs the oracle's final SELECT over the
materialized names and digests both sides like check_oracle_big
(canonicalized count + hash-sum => multiset equality). Zero semantic
change — the SQL text executed per chunk IS the oracle's own body plus a
chunk predicate on the window's partition key.

Usage:
  python3 tools/check_oracle_chunked.py <sfDir> <verifyOutDir> <query ...>
Env: GRAFT_DUCKDB_MEMLIMIT (e.g. 30GB), GRAFT_CHUNKS (default 48).
"""
import json
import os
import re
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# CTE name -> (pattern in its body, replacement template with {k}/{i},
# optional k override). Each pattern sits inside the subquery whose
# row_number PARTITIONS BY the chunk key (or, for rer, whose output is a
# disjoint union over the key), so per-chunk evaluation is exact.
CHUNK_RULES = {
    "ta": ("WHERE t.vec_id < p.tn) x",
           "WHERE t.vec_id < p.tn AND t.vec_id % {k} = {i}) x"),
    "bta": ("WHERE t.vec_id < p.tn) x",
            "WHERE t.vec_id < p.tn AND t.vec_id % {k} = {i}) x"),
    "vg": ("FROM e CROSS JOIN coarse g) x",
           "FROM e CROSS JOIN coarse g WHERE e.vec_id % {k} = {i}) x"),
    "vf": ("FROM vg v JOIN f2g f ON v.gid = f.gid) x",
           "FROM vg v JOIN f2g f ON v.gid = f.gid "
           "WHERE v.vec_id % {k} = {i}) x"),
    "codes": ("FROM sv v JOIN bookn b ON v.sub = b.sub) x",
              "FROM sv v JOIN bookn b ON v.sub = b.sub "
              "WHERE v.vec_id % {k} = {i}) x"),
    # graph_pagerank: blocked matvec. e1's DISTINCT hash over 180M
    # lineitem rows blocks by l_partkey (u = partkey*2, so (u,v) slices
    # are disjoint); each rank round blocks by the aggregation's OWN group
    # key (d.u = e.v — e.v determines the output group, so per-slice
    # aggregation is exact), bounding the join+agg working set to
    # |edges|/k per chunk.
    "e1": ("l_suppkey * 2 + 1 AS v\n  FROM lineitem",
           "l_suppkey * 2 + 1 AS v\n  FROM lineitem "
           "WHERE l_partkey % {k} = {i}"),
    "r1": ("JOIN deg d ON d.u = e.v\n  GROUP BY d.u, d.deg",
           "JOIN deg d ON d.u = e.v WHERE e.v % {k} = {i}\n"
           "  GROUP BY d.u, d.deg"),
    "r2": ("JOIN deg d ON d.u = e.v\n  GROUP BY d.u, d.deg",
           "JOIN deg d ON d.u = e.v WHERE e.v % {k} = {i}\n"
           "  GROUP BY d.u, d.deg"),
}

# Algebraic rewrites applied verbatim-on-match BEFORE chunking, for bodies
# whose PLAN (not size) is the problem. The batch rerank's `a.vec_id <>
# pr.qid` inequality makes DuckDB pick an early NESTED_LOOP_JOIN of e
# (600k rows carrying 64-d lists) against probe x qq — a 230M-row,
# ~230GB spilled intermediate — and the filter refuses to push below it.
# The rewrite computes the candidate (qid, vec_id) set first (pure
# equi-join of the two narrow tables plus the residual, with a.vec_id
# substituted by the equal vf.vec_id), then equi-joins the list-carrying
# tables onto the ~300k candidates. Inner-join associativity +
# substitution through `a.vec_id = vf.vec_id` make it exactly the
# original relation.
BODY_REWRITES = {
    "rer": ("FROM vf\n  JOIN probe pr ON vf.cid = pr.cid\n"
            "  JOIN e a ON a.vec_id = vf.vec_id\n"
            "  JOIN qq ON qq.qid = pr.qid\n"
            "  WHERE a.vec_id <> pr.qid",
            "FROM (SELECT pr.qid, vf.vec_id FROM vf "
            "JOIN probe pr ON vf.cid = pr.cid "
            "WHERE vf.vec_id <> pr.qid) pr "
            "JOIN e a ON a.vec_id = pr.vec_id "
            "JOIN qq ON qq.qid = pr.qid"),
}


def cte_spans(sql: str):
    """(name, body_start, body_end) for each top-level CTE, in order."""
    spans = []
    for m in re.finditer(r"([a-z0-9_]+) AS \(", sql):
        # skip matches nested inside a previously found body
        if spans and m.start() < spans[-1][2]:
            continue
        depth, i = 1, m.end()
        while depth > 0:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        spans.append((m.group(1), m.end(), i - 1))
    return spans


def canon_expr(con, rel_sql: str) -> str:
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


def run_query(con, name: str, sql: str, k: int) -> tuple:
    spans = cte_spans(sql)
    done = []

    def prefix():
        if not done:
            return ""
        return "WITH " + ", ".join(
            f"{n} AS (SELECT * FROM __{n})" for n in done) + " "

    for n, s, t in spans:
        body = sql[s:t]
        rw = BODY_REWRITES.get(n)
        if rw and rw[0] in body:
            body = body.replace(rw[0], rw[1])
        con.execute(f"DROP TABLE IF EXISTS __{n}")
        rule = CHUNK_RULES.get(n)
        if rule and rule[0] in body:
            pat, repl = rule[0], rule[1]
            kk = rule[2] if len(rule) > 2 else k
            for i in range(kk):
                chunked = body.replace(pat, repl.format(k=kk, i=i))
                stmt = (f"CREATE TABLE __{n} AS " if i == 0
                        else f"INSERT INTO __{n} ") + prefix() + chunked
                con.execute(stmt)
        else:
            con.execute(f"CREATE TABLE __{n} AS " + prefix() + body)
        done.append(n)

    final = sql[spans[-1][2] + 1:].lstrip().lstrip(",").strip()
    return digest(con, prefix() + final)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    k = int(os.environ.get("GRAFT_CHUNKS", "48"))
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
            print(f"MISS  {name}", flush=True)
            n_bad += 1
            continue
        try:
            sn, sh = digest(
                con, f"SELECT * FROM read_parquet('{res}/*.parquet')")
            on, oh = run_query(con, name, oracle[name], k)
            if sn == on and sh == oh:
                print(f"OK    {name} ({sn} rows, hashsum match)", flush=True)
                n_ok += 1
            else:
                print(f"BAD   {name}: spark=({sn},{sh}) oracle=({on},{oh})",
                      flush=True)
                n_bad += 1
        except Exception as e:
            print(f"ERR   {name}: {e}", flush=True)
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
