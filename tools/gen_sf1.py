#!/usr/bin/env python3
"""Deterministic sf1 slice generator (committed — r13; the r10–r12
rounds drove this from a /tmp script that did not survive the host,
which made the sf1 verdict reproducible only within a session).

Scheme (SCALE.md "sf0.1 -> sf1 scale validation"): FACTOR disjoint
copies of the driver's sf0.1 tables.

- fact/entity keys shift by copy*stride (stride = the table's dense key
  count), so copies never collide: orders/lineitem (o_orderkey),
  customer (c_custkey, and the name gets a per-copy suffix — the
  cross-copy cliques the fuzzy-match study measures),
  events (event_id, user_id), documents (doc_id), embeddings (vec_id);
- document text is token-suffixed per copy so vocabulary, dedup, BPE
  and novelty workloads scale honestly instead of collapsing onto
  exact clones;
- suffixes are FIXED-WIDTH zero-padded ("_007"), the same width at
  every factor (VERDICT r14 ask #4): the r14 scheme's variable-width
  "_k" made copies k >= 10 carry longer names/tokens than copies 0-9,
  shifting the name-length distribution (and the entropy-balanced
  blocking-class profile fuzzy-match/entity-resolution key on)
  BETWEEN factors — so the sf2/sf10 pair-law readings measured the
  generator, not the plan. With a constant width, every copy of every
  factor transforms names identically and the length distribution is
  factor-invariant;
- embeddings are perturbed per copy (component * (1 + k/1000), cast
  back to FLOAT) so IVF/LSH cells stay geometrically distinct; copy 0
  is pristine — the vec_id < 8 probe set keeps its original geometry;
- dimensions (region nation part supplier) copy through unchanged.

Copy 0 keeps the source KEYS (shift 0), so "doc_id < N"-style fixture
bounds select the same rows at both scales; its text/name suffix is
the uniform "_000", which preserves within-copy similarity structure
(every token of every doc transforms identically, so common-word
counts between copy-0 documents are unchanged), and its embeddings
are exactly pristine (x * 1.0 is identity in IEEE float).

Usage: python3 tools/gen_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1] [factor=10]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# factor-INVARIANT suffix width (supports FACTOR <= 1000): "_007" at
# sf1 and at sf10 alike, so name/token lengths never depend on the
# factor being generated
assert FACTOR <= 1000, "raise the fixed suffix width for larger factors"
def sfx(k):
    return f"_{k:03d}"

STRIDES = {
    "o_orderkey": None,  # filled from data below
    "c_custkey": None,
    "event_id": None,
    "user_id": None,
    "doc_id": None,
    "vec_id": None,
}


def main():
    import os

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def stride(table, key):
        # dense 0..n-1 keys: stride = count (asserted so a regenerated
        # harness drop can't silently produce overlapping copies)
        mn, mx, n = con.execute(
            f"SELECT min({key}), max({key}), count(DISTINCT {key}) "
            f"FROM '{SRC}/{table}.parquet'"
        ).fetchone()
        assert mn == 0 and mx == n - 1, f"{table}.{key} not dense 0..n-1: {mn}..{mx} ({n})"
        return n

    so = stride("orders", "o_orderkey")
    sc = stride("customer", "c_custkey")
    se = stride("events", "event_id")
    su = con.execute(f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    sd = stride("documents", "doc_id")
    sv = stride("embeddings", "vec_id")

    def gen(table, select_per_copy):
        parts = [select_per_copy(k) for k in range(FACTOR)]
        sql = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    gen("orders", lambda k: f"""
        SELECT o_orderkey + {k * so} AS o_orderkey,
               o_custkey + {k * sc} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""")

    gen("lineitem", lambda k: f"""
        SELECT l_orderkey + {k * so} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""")

    gen("customer", lambda k: f"""
        SELECT c_custkey + {k * sc} AS c_custkey,
               c_name || '{sfx(k)}' AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet'""")

    gen("events", lambda k: f"""
        SELECT event_id + {k * se} AS event_id, ts,
               user_id + {k * su} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet'""")

    gen("documents", lambda k: f"""
        SELECT doc_id + {k * sd} AS doc_id,
               array_to_string(list_transform(string_split(text, ' '),
                   x -> CASE WHEN x = '' THEN x ELSE x || '{sfx(k)}' END), ' ') AS text,
               lang, source,
               length(array_to_string(list_transform(string_split(text, ' '),
                   x -> CASE WHEN x = '' THEN x ELSE x || '{sfx(k)}' END), ' ')) AS n_chars
        FROM '{SRC}/documents.parquet'""")

    gen("embeddings", lambda k: f"""
        SELECT vec_id + {k * sv} AS vec_id,
               CAST(list_transform(embedding,
                    x -> CAST(x * (1.0 + {k} / 1000.0) AS FLOAT)) AS FLOAT[]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet'""")

    for dim in ("region", "nation", "part", "supplier"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
            f"TO '{DST}/{dim}.parquet' (FORMAT PARQUET)")
        print(f"{dim}: copied")


if __name__ == "__main__":
    main()
