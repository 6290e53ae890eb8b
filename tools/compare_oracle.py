#!/usr/bin/env python3
"""One-command DuckDB oracle compare for a graft.Verify dump.

Usage:
    python3 tools/compare_oracle.py <verify_out_dir> <sf_dir> \
        [--json PATH] [--decompose]

--decompose verifies the connected-component closure queries via the
decomposed path (non-recursive edges SQL in DuckDB, python min-id
union-find, tail SQL over the labeling) instead of the recursive
`reach` CTE — REQUIRED for sf1 replays, where the all-pairs closure is
infeasible in DuckDB; equivalent at small SFs (sweeps run both ways).

<verify_out_dir> is the directory graft.Verify wrote (one parquet dir
per query + oracle_sql.json + verify_summary.json); <sf_dir> holds the
input tables (e.g. /root/testdata/sf0.01). Runs every oracle SQL in
DuckDB over the same inputs, compares against the dumped parquet with
the driver's discipline (columns sorted by name, rows sorted by all
columns, exact pandas .equals; a float-only mismatch is retried at
round(9) and reported as "rounded"), prints one OK/FAIL line per query,
and writes a machine-readable verdict merging the Verify self-report
(rows / wall / content hash) with the compare outcome. Exit code 0 iff
every oracle-bearing query matches.

Replay of a full round verdict:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/compare_oracle.py /tmp/verify_out /root/testdata/sf0.01 \
        --json CORRECTNESS_SELF.json

Requires: python3 with duckdb + pyarrow + pandas (driver-side tooling
only — never a library dependency).
"""
import argparse
import json
import os
import sys

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def union_find_min_id(edges):
    """Min-id component labeling over an (a, b) edge list: every edge
    endpoint maps to the smallest id in its connected component —
    exactly the labeling the oracles' recursive `comp` CTE computes,
    derived independently (path-halving union-find, no SQL recursion).
    """
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps the root the component minimum,
            # which IS the final label — no relabel pass needed
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in parent}


def oracle_decomposed(con, edges_sql, tail_sql):
    """Run a closure oracle the --decompose way: non-recursive edges in
    DuckDB -> python union-find -> register uf_comp -> tail SQL.
    """
    import pandas as pd
    edges = con.execute(edges_sql).fetchdf()
    labels = union_find_min_id(
        zip(edges.iloc[:, 0].tolist(), edges.iloc[:, 1].tolist()))
    comp = pd.DataFrame(
        {"node": list(labels.keys()), "component": list(labels.values())},
        dtype="int64")
    con.register("uf_comp", comp)
    try:
        return con.execute(tail_sql).fetchdf()
    finally:
        con.unregister("uf_comp")


def compare_one(con, dump_dir, oracle_sql, decomposed=None):
    mine = canon(con.execute(
        f"SELECT * FROM '{dump_dir}/*.parquet'").fetchdf())
    if decomposed is not None:
        oracle = canon(oracle_decomposed(con, *decomposed))
    else:
        oracle = canon(con.execute(oracle_sql).fetchdf())
    if mine.shape != oracle.shape:
        return "FAIL", f"shape {mine.shape} vs {oracle.shape}"
    if list(mine.columns) != list(oracle.columns):
        return "FAIL", f"columns {list(mine.columns)} vs {list(oracle.columns)}"
    if mine.equals(oracle):
        return "OK", ""
    # float-only last-ulp divergence: retry with the driver's rounded
    # compare before declaring a mismatch
    m2, o2 = mine.copy(), oracle.copy()
    floaty = [c for c in m2.columns if str(m2[c].dtype).startswith("float")]
    for c in floaty:
        m2[c] = m2[c].round(9)
        o2[c] = o2[c].round(9)
    if floaty and canon(m2).equals(canon(o2)):
        return "ROUNDED", f"exact at round(9) on {floaty}"
    bad = [c for c in m2.columns if not m2[c].equals(o2[c])]
    return "FAIL", f"value mismatch in columns {bad}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write the merged machine-readable verdict here")
    ap.add_argument("--decompose", action="store_true",
                    help="verify closure queries via the decomposed path "
                         "(non-recursive edges SQL + python min-id "
                         "union-find + tail SQL) instead of the recursive "
                         "reach CTE — REQUIRED at sf1, where the all-pairs "
                         "closure is infeasible in DuckDB; equivalent at "
                         "small SFs (run both ways to cross-check)")
    args = ap.parse_args()

    import duckdb  # driver-side only
    with open(os.path.join(args.out_dir, "oracle_sql.json")) as f:
        oracle_sql = json.load(f)
    decomposed = {}
    if args.decompose:
        dec_path = os.path.join(args.out_dir, "oracle_decomposed.json")
        if not os.path.exists(dec_path):
            sys.exit("--decompose needs oracle_decomposed.json in the dump "
                     "dir (written by graft.Verify)")
        with open(dec_path) as f:
            decomposed = {k: (v["edges"], v["tail"])
                          for k, v in json.load(f).items()}
    summary_path = os.path.join(args.out_dir, "verify_summary.json")
    self_report = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            self_report = json.load(f).get("queries", {})

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    verdict, counts = {}, {"OK": 0, "ROUNDED": 0, "FAIL": 0}
    # iterate the ORACLE key set, not the output dirs — a query whose
    # dump errored inside Verify has no dir and would silently vanish
    # from a dir-driven loop (this hid a real failure once). Verify
    # dumps the FULL oracle map even for a targeted run, so when a
    # self-report exists, restrict to the queries actually attempted
    # (a Verify-errored query still appears there with ok:false).
    names = sorted(oracle_sql)
    if self_report:
        names = [n for n in names if n in self_report]
    for name in names:
        dump_dir = os.path.join(args.out_dir, name)
        if not os.path.isdir(dump_dir):
            status, detail = "FAIL", "no dump — Verify errored; see its stderr"
        else:
            try:
                status, detail = compare_one(con, dump_dir, oracle_sql[name],
                                             decomposed.get(name))
                if status == "OK" and name in decomposed:
                    detail = "decomposed closure path"
            except Exception as e:  # oracle SQL error, parquet read error
                status, detail = "FAIL", f"{type(e).__name__}: {e}"[:300]
        counts[status] += 1
        entry = {"match": status != "FAIL", "status": status}
        if detail:
            entry["detail"] = detail
        entry.update({k: v for k, v in self_report.get(name, {}).items()
                      if k in ("rows", "hash", "sec", "error")})
        verdict[name] = entry
        print(f"{status:7s} {name}" + (f"  ({detail})" if detail else ""))

    total = sum(counts.values())
    line = (f"{counts['OK']} exact + {counts['ROUNDED']} rounded-exact "
            f"+ {counts['FAIL']} fail / {total}")
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "n_queries": total,
                       "n_exact": counts["OK"],
                       "n_rounded": counts["ROUNDED"],
                       "n_fail": counts["FAIL"],
                       "queries": verdict}, f, indent=1, sort_keys=True)
        print(f"verdict written to {args.json_out}")
    sys.exit(0 if counts["FAIL"] == 0 else 1)


if __name__ == "__main__":
    main()
