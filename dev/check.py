#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2).

Usage: python3 dev/check.py <verify_outdir> <sf_dir>

Loads each <outdir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
same fixture tables, sorts columns by name, and compares row-by-row.
Dev tool only — the shipped Scala library never depends on this.
"""
import duckdb
import glob
import json
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import decimal
    import math
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)

    qdirs = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in qdirs:
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got_rel = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        got_cols = [c[0] for c in got_rel.description]
        got = got_rel.fetchall()
        if name not in oracle:
            print(f"  -  {name}: no-oracle, rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [c[0] for c in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        eperm = [exp_cols.index(c) for c in sorted(exp_cols)]
        bad = None
        for i, (gr, er) in enumerate(zip(got, exp)):
            g = tuple(norm_cell(gr[j]) for j in gperm)
            e = tuple(norm_cell(er[j]) for j in eperm)
            if g != e:
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: row {i}\n  spark : {g}\n  oracle: {e}")
            n_fail += 1
        else:
            print(f"  ok {name}: rows={len(got)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
