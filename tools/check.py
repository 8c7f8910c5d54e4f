#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped):
runs each oracle_sql.json query in DuckDB against the sf parquet tables and
compares with the Verify-dumped parquet, column-name-sorted and row-sorted.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"BAD  {name}: oracle error: {str(e)[:200]}")
            n_bad += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"BAD  {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"BAD  {name}: rows {len(got)} vs {len(exp)}")
            n_bad += 1
            continue
        sg = got.dtypes.astype(str).to_dict(); se = exp.dtypes.astype(str).to_dict()
        if sg != se:
            print(f"WARN {name}: dtypes differ {sg} vs {se}")
        gr = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)], key=str)
        er = sorted([tuple(norm(v) for v in r) for r in exp.itertuples(index=False)], key=str)
        if gr == er:
            print(f"OK   {name}: {len(got)} rows")
            n_ok += 1
        else:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"BAD  {name}: {len(diffs)}/{len(gr)} differing rows; first: ")
            for a, b in diffs[:3]:
                print(f"      got {a}")
                print(f"      exp {b}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_skip} rows-only")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
