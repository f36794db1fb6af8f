#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
compares against the oracle SQL in <verifyOutDir>/oracle_sql.json run
over <sfDir>'s tables. Sorts columns by name, then rows, then compares.
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)])
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"rows  {name}: rows-only ({len(got)} rows)"); n_rowsonly += 1; continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL  {name}: columns differ spark={gc} oracle={ec}"); n_fail += 1; continue
        g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        e = exp[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        if len(g) != len(e):
            print(f"FAIL  {name}: rowcount spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        gs = g.astype(str); es = e.astype(str)
        if gs.equals(es):
            print(f"PASS  {name} ({len(g)} rows)"); n_pass += 1
        else:
            diff = (gs != es).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL  {name}: {int(diff.sum())}/{len(g)} rows differ; first:")
            for i in idx:
                print(f"      spark : {g.loc[i].to_dict()}")
                print(f"      oracle: {e.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
