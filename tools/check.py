#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, runs each oracle SQL, and compares against the Spark result
parquet written by graft.Verify: row count, column names (sorted), and
per-value equality after sorting columns by name.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # a SPARK_GRAFT_ONLY-filtered Verify run writes oracle_sql.partial.json
    # (never overwriting a full manifest). Use it ONLY when this check run
    # is itself a subset iteration (SPARK_GRAFT_ONLY set): a leftover
    # partial from an interrupted iteration must not silently turn an
    # intended-full check into a green subset check.
    import os
    partial = f"{out_dir}/oracle_sql.partial.json"
    manifest = f"{out_dir}/oracle_sql.json"
    oracles = None
    if os.path.exists(partial):
        if os.environ.get("SPARK_GRAFT_ONLY"):
            # the partial records which SPARK_GRAFT_ONLY produced it; a stale
            # partial from a DIFFERENT subset run must not report green for
            # the wrong queries
            with open(partial) as f:
                pdata = json.load(f)
            recorded = pdata.get("only") if isinstance(pdata, dict) else None
            if not (isinstance(pdata, dict) and "oracles" in pdata):
                print(f"FAIL: partial manifest {partial} has no subset record "
                      "(written by an older Verify?) — rerun Verify")
                return 1
            if recorded != os.environ["SPARK_GRAFT_ONLY"]:
                print(f"FAIL: partial manifest was produced by SPARK_GRAFT_ONLY="
                      f"{recorded!r} but this check runs with "
                      f"{os.environ['SPARK_GRAFT_ONLY']!r} — rerun Verify")
                return 1
            oracles = pdata["oracles"]
            print(f"note: SUBSET check via partial manifest {partial}")
        else:
            print(f"note: ignoring leftover partial manifest {partial} "
                  "(set SPARK_GRAFT_ONLY to check a subset)")
    if oracles is None:
        with open(manifest) as f:
            oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).fetch_arrow_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            import glob
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pq.read_table(files[0] if len(files) == 1 else f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        o = oracle.reindex(sorted(oracle.columns), axis=1)
        g = got.reindex(sorted(got.columns), axis=1)
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != oracle {list(o.columns)}")
            failures += 1
            continue
        if len(o) != len(g):
            print(f"FAIL {name}: rows {len(g)} != oracle {len(o)}")
            failures += 1
            continue
        o = o.reset_index(drop=True)
        g = g.reset_index(drop=True)
        mismatch = None
        for c in o.columns:
            oc, gc = o[c], g[c]
            eq = (oc.astype(object).where(pd.notnull(oc), None) ==
                  gc.astype(object).where(pd.notnull(gc), None))
            eq = eq | (oc.isna() & gc.isna())  # both-null counts as equal
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                mismatch = f"col {c} row {i}: spark={gc.iloc[i]!r} oracle={oc.iloc[i]!r} (types {gc.dtype}/{oc.dtype})"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            failures += 1
        else:
            print(f"OK   {name} ({len(o)} rows)")
    declared = None
    try:
        with open(f"{out_dir}/declared_count.json") as f:
            declared = json.load(f).get("declared")
    except Exception:
        pass
    suffix = ""
    if declared is not None and declared != len(oracles):
        suffix = f" (SUBSET: {len(oracles)} of {declared} declared queries checked)"
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match{suffix}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
