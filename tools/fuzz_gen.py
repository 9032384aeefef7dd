#!/usr/bin/env python3
"""Generate seeded random SQL (shared Spark/DuckDB dialect subset) for the
cross-engine fuzz gate.

Usage: python3 tools/fuzz_gen.py <outFile.tsv> [n] [seed]

Writes name<TAB>sql lines. The grammar stays inside the dialect-shared
subset the engine's determinism rules allow: integer/double comparisons,
string IN/LIKE, date casts from ISO strings, modulo buckets, conjunctions/
disjunctions, key-only projections with total ORDER BY, and a join+count
template. graft.FuzzVerify executes each with spark.sql;
tools/check_oracle.py compares against DuckDB.
"""
import random
import sys

STATUSES = ["'F'", "'O'", "'P'"]
PRIOS = ["'1-URGENT'", "'2-HIGH'", "'3-MEDIUM'", "'4-NOT SPECIFIED'", "'5-LOW'"]


def gen_pred(rnd):
    kind = rnd.randrange(6)
    if kind == 0:
        lo = rnd.randrange(1000, 200000)
        return f"o_totalprice BETWEEN {lo} AND {lo + rnd.randrange(1000, 100000)}"
    if kind == 1:
        vals = rnd.sample(STATUSES, rnd.randrange(1, 3))
        return f"o_orderstatus IN ({', '.join(vals)})"
    if kind == 2:
        return f"o_orderpriority LIKE '{rnd.randrange(1, 6)}%'"
    if kind == 3:
        y = rnd.randrange(1995, 2001)
        m = rnd.randrange(1, 13)
        op = rnd.choice(["<", ">=", "<=", ">"])
        return (f"CAST(o_orderdate AS DATE) {op} CAST('{y}-{m:02d}-01' AS DATE)")
    if kind == 4:
        k = rnd.randrange(2, 17)
        return f"o_custkey % {k} = {rnd.randrange(k)}"
    return f"o_orderkey % {rnd.randrange(2, 9)} <> 0"


def gen_li_pred(rnd):
    kind = rnd.randrange(4)
    if kind == 0:
        flags = rnd.sample(["'A'", "'N'", "'R'"], rnd.randrange(1, 3))
        return f"l_returnflag IN ({', '.join(flags)})"
    if kind == 1:
        lo = rnd.randrange(1, 40)
        return f"l_quantity BETWEEN {lo} AND {lo + rnd.randrange(5, 20)}"
    if kind == 2:
        return f"l_linenumber <= {rnd.randrange(1, 8)}"
    return f"l_partkey % {rnd.randrange(2, 13)} = {rnd.randrange(2)}"


def gen_query(rnd, i):
    preds = [gen_pred(rnd) for _ in range(rnd.randrange(1, 4))]
    glue = " AND " if rnd.random() < 0.7 else " OR "
    where = glue.join(f"({p})" for p in preds)
    kind = rnd.randrange(17)
    if kind == 16:  # lag-pair transition + window-SUM margins (the R9b
        # class agg_event_transitions hit: DuckDB window SUM is HUGEINT,
        # Spark's is BIGINT — the shared CAST must reconcile them; lag
        # over a unique (key) order keeps pairs deterministic)
        k = rnd.randrange(3, 20)
        return (f"WITH e AS (SELECT o_custkey % {k} AS u, o_orderkey AS t, "
                f"o_orderstatus AS s FROM orders WHERE {where}), "
                f"l AS (SELECT u, s, lag(s) OVER (PARTITION BY u "
                f"ORDER BY t) AS prev FROM e), "
                f"c AS (SELECT prev, s, COUNT(*) AS n FROM l "
                f"WHERE prev IS NOT NULL GROUP BY prev, s) "
                f"SELECT prev, s, n, "
                f"CAST(SUM(n) OVER (PARTITION BY prev) AS BIGINT) AS tot "
                f"FROM c ORDER BY prev, s")
    if kind == 15:  # winnowing-style window-min fingerprint selection
        # (dedup_winnow_fingerprint's shape): multiplicative hash, key =
        # h * 2^21 + (2^21-1-pos) so min-key encodes (min hash, rightmost
        # pos), ROWS frame MIN, full-window validity filter. 2^21 is a
        # power of two so FLOOR(x / 2097152.0) is exact in both engines.
        a = rnd.choice([48271, 69621, 16807, 1103515245 % 65521])
        c = rnd.randrange(0, 1000)
        m = rnd.choice([999983, 1000003, 262139])
        wlen = rnd.randrange(2, 7)
        k = rnd.randrange(5, 40)
        return (f"WITH h AS (SELECT o_custkey % {k} AS g, o_orderkey AS pos, "
                f"((o_orderkey * {a} + {c}) % {m}) * 2097152 "
                f"+ (2097151 - o_orderkey % 2097152) AS key "
                f"FROM orders WHERE {where}), "
                f"r AS (SELECT g, pos, key, "
                f"row_number() OVER (PARTITION BY g ORDER BY pos ASC) AS rn, "
                f"COUNT(*) OVER (PARTITION BY g) AS n FROM h), "
                f"w AS (SELECT g, rn, n, "
                f"MIN(key) OVER (PARTITION BY g ORDER BY pos ASC "
                f"ROWS BETWEEN CURRENT ROW AND {wlen - 1} FOLLOWING) AS wkey "
                f"FROM r) "
                f"SELECT DISTINCT g, CAST(FLOOR(wkey / 2097152.0) AS BIGINT) AS fp "
                f"FROM w WHERE rn <= n - {wlen - 1} "
                f"ORDER BY g, fp")
    if kind == 14:  # keyless point-in-interval join: exercises the
        # variable-width path of RangeJoinRewrite (interval side
        # replicates to its spanning cells) against DuckDB's IEJoin
        p2 = gen_pred(rnd)
        c1 = rnd.randrange(20, 200)
        c2 = rnd.randrange(20, 200)
        return (f"WITH a AS (SELECT o_orderkey AS id, "
                f"CAST(round(o_totalprice) AS BIGINT) AS v "
                f"FROM orders WHERE {where}), "
                f"b AS (SELECT o_orderkey AS id, "
                f"CAST(round(o_totalprice) AS BIGINT) - {c1} AS lo, "
                f"CAST(round(o_totalprice) AS BIGINT) + {c2} AS hi "
                f"FROM orders WHERE ({p2})) "
                f"SELECT a.id AS a_id, b.id AS b_id, a.v - b.lo AS off_lo "
                f"FROM a JOIN b ON a.v >= b.lo AND a.v <= b.hi AND a.id <> b.id "
                f"ORDER BY a_id, b_id")
    if kind == 13:  # keyless band self-join: exercises RangeJoinRewrite on
        # the Spark side (cell-replicated equi-join) against DuckDB's
        # IEJoin running the identical SQL
        p2 = gen_pred(rnd)
        c = rnd.randrange(50, 400)
        return (f"WITH a AS (SELECT o_orderkey AS id, "
                f"CAST(round(o_totalprice) AS BIGINT) AS v "
                f"FROM orders WHERE {where}), "
                f"b AS (SELECT o_orderkey AS id, "
                f"CAST(round(o_totalprice) AS BIGINT) AS v "
                f"FROM orders WHERE ({p2})) "
                f"SELECT a.id AS a_id, b.id AS b_id, b.v - a.v AS delta "
                f"FROM a JOIN b ON abs(a.v - b.v) <= {c} AND a.id < b.id "
                f"ORDER BY a_id, b_id")
    if kind == 12:  # weighted-median shape: smallest value whose doubled
        # cumulative weight crosses the group total (min-over-qualifying
        # is tie-order-independent; see agg_weighted_median)
        k = rnd.randrange(3, 11)
        return (f"WITH g AS (SELECT o_orderstatus AS grp, "
                f"CAST(round(o_totalprice) AS BIGINT) AS v, "
                f"o_orderkey % {k} + 1 AS wt FROM orders WHERE {where}), "
                f"w AS (SELECT grp, v, "
                f"SUM(wt) OVER (PARTITION BY grp ORDER BY v "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
                f"SUM(wt) OVER (PARTITION BY grp) AS tot FROM g) "
                f"SELECT grp, MIN(v) AS wmed FROM w WHERE cum * 2 >= tot "
                f"GROUP BY grp ORDER BY grp")
    if kind == 11:  # running distinct via first-occurrence flags (the
        # DISTINCT-window-free formulation both engines share)
        return (f"WITH f AS (SELECT o_custkey, o_orderkey, "
                f"CASE WHEN row_number() OVER (PARTITION BY o_custkey, o_orderpriority "
                f"ORDER BY o_orderkey ASC) = 1 THEN 1 ELSE 0 END AS fs "
                f"FROM orders WHERE {where}) "
                f"SELECT o_custkey, o_orderkey, "
                f"CAST(SUM(fs) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nd "
                f"FROM f ORDER BY o_custkey, o_orderkey")
    if kind == 10:  # CASE-precedence verdict (curation-verdict shape)
        x = rnd.randrange(20000, 200000)
        k = rnd.randrange(3, 9)
        return (f"SELECT CASE WHEN o_totalprice < {x} THEN 'low' "
                f"WHEN o_orderpriority LIKE '{rnd.randrange(1, 6)}%' THEN 'prio' "
                f"WHEN o_custkey % {k} = 0 THEN 'bucket' "
                f"ELSE 'other' END AS verdict, COUNT(*) AS n "
                f"FROM orders WHERE {where} GROUP BY 1 ORDER BY 1")
    if kind == 9:  # cumulative-fill bin id (context-packing shape); floor of
        # a double division replaces integer `div`/`//` (dialects differ);
        # exact below 2^53
        b = rnd.choice([1000, 5000, 20000, 100000])
        return (f"SELECT o_custkey, o_orderkey, "
                f"CAST(FLOOR(coalesce(SUM(CAST(round(o_totalprice) AS BIGINT)) OVER ("
                f"PARTITION BY o_custkey ORDER BY o_orderkey ASC "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {b}) "
                f"AS BIGINT) AS bin_id "
                f"FROM orders WHERE {where} ORDER BY o_custkey, o_orderkey")
    if kind == 8:  # e6 running sum over a sliding ROWS frame
        lo = rnd.randrange(0, 4)
        hi = rnd.randrange(0, 4)
        return (f"SELECT o_custkey, o_orderkey, "
                f"CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER ("
                f"PARTITION BY o_custkey ORDER BY o_orderkey ASC "
                f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING) AS DECIMAL(38,6)) "
                f"* 1000000 AS BIGINT) AS s_e6 "
                f"FROM orders WHERE {where} ORDER BY o_custkey, o_orderkey")
    if kind == 7:  # lag/lead deltas with unique-key ordering
        off = rnd.randrange(1, 4)
        # parens required: Spark parses `OVER w - x` as identifier `w-x`
        return (f"SELECT o_orderkey, "
                f"o_orderkey - (lag(o_orderkey, {off}) OVER w) AS lag_d, "
                f"(lead(o_orderkey, {off}) OVER w) - o_orderkey AS lead_d "
                f"FROM orders WHERE {where} "
                f"WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC) "
                f"ORDER BY o_orderkey")
    if kind == 6:  # lineitem decimal-measure aggregation
        lw = " AND ".join(f"({gen_li_pred(rnd)})" for _ in range(rnd.randrange(1, 3)))
        # R2': decimal math internally, micro-scaled BIGINT at the output
        # boundary (raw DECIMAL output fails the driver's hash-compare).
        return (f"SELECT l_returnflag, l_linestatus, "
                f"CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sq_e6, "
                f"CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * "
                f"(1 - CAST(l_discount AS DECIMAL(18,6)))) * 1000000 AS BIGINT) AS sd_e6, "
                f"COUNT(*) AS n FROM lineitem WHERE {lw} "
                f"GROUP BY l_returnflag, l_linestatus "
                f"ORDER BY l_returnflag, l_linestatus")
    if kind == 0:
        return (f"SELECT o_orderkey, COUNT(*) AS n_lines "
                f"FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
                f"WHERE {where} GROUP BY o_orderkey ORDER BY o_orderkey")
    if kind == 1:
        return (f"SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n "
                f"FROM orders WHERE {where} "
                f"GROUP BY o_orderstatus, o_orderpriority "
                f"ORDER BY o_orderstatus, o_orderpriority")
    if kind == 2:  # decimal aggregation (rule R2 casts)
        return (f"SELECT o_orderstatus, "
                f"CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS s_e6, "
                f"COUNT(*) AS n FROM orders WHERE {where} "
                f"GROUP BY o_orderstatus ORDER BY o_orderstatus")
    if kind == 3:  # window rank with unique tie-break
        return (f"SELECT o_orderkey, CAST(rn AS INT) AS rn FROM ("
                f"SELECT o_orderkey, row_number() OVER ("
                f"PARTITION BY o_orderstatus "
                f"ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn "
                f"FROM orders WHERE {where}) t "
                f"WHERE rn <= {rnd.randrange(2, 8)} ORDER BY o_orderkey")
    if kind == 4:  # set op between two predicate slices
        p2 = gen_pred(rnd)
        op = rnd.choice(["INTERSECT", "EXCEPT", "UNION"])
        return (f"SELECT * FROM ("
                f"SELECT o_orderkey FROM orders WHERE {where} "
                f"{op} SELECT o_orderkey FROM orders WHERE ({p2})) t "
                f"ORDER BY o_orderkey")
    return (f"SELECT o_orderkey, o_orderstatus FROM orders "
            f"WHERE {where} ORDER BY o_orderkey")


def main():
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rnd = random.Random(seed)
    with open(out, "w") as f:
        for i in range(n):
            f.write(f"fuzz_{i:03d}\t{gen_query(rnd, i)}\n")
    print(f"wrote {n} queries to {out}")


if __name__ == "__main__":
    main()
