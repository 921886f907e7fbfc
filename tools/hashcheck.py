#!/usr/bin/env python3
"""Driver-accurate hash gate: oracle via duckdb .df() (DECIMAL -> float64),
Spark result via pyarrow (DECIMAL -> Decimal objects), compared on str() of
every cell after sorting columns by name.

Round-1 lesson: this asymmetry is what the driver's hash_match does — a
DECIMAL output column whose value has trailing zeros ('77076.00' vs float64
'77076.0') hash-mismatches even though values are numerically equal. Hence
the repo convention: final output columns are DOUBLE (or int/string), never
DECIMAL; keep DECIMAL only for the internal exact aggregation.

Usage: python3 tools/hashcheck.py <sfDir> <verifyOutDir>
"""
import glob
import hashlib
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def h_str(df):
    df = df.reindex(sorted(df.columns), axis=1)
    m = hashlib.sha256()
    for c in df.columns:
        for v in df[c]:
            m.update(str(v).encode())
    return m.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            o = con.execute(sql).df()  # driver path: fetchdf
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            g = pq.read_table(files if len(files) > 1 else files[0]).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if sorted(o.columns) != sorted(g.columns):
            print(f"FAIL {name}: columns {sorted(g.columns)} != {sorted(o.columns)}")
            failures += 1
        elif len(o) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(o)}")
            failures += 1
        elif h_str(o) != h_str(g):
            # locate first differing cell for the report
            o2 = o.reindex(sorted(o.columns), axis=1)
            g2 = g.reindex(sorted(g.columns), axis=1)
            detail = ""
            for c in o2.columns:
                for i in range(len(o2)):
                    if str(o2[c].iloc[i]) != str(g2[c].iloc[i]):
                        detail = f" first diff {c}[{i}]: oracle={o2[c].iloc[i]!r} spark={g2[c].iloc[i]!r}"
                        break
                if detail:
                    break
            print(f"FAIL {name}: hash mismatch{detail}")
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    n = len(oracles)
    print(f"{n - failures}/{n} queries hash-match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
