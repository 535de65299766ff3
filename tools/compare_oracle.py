#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
`graft.Verify <sfDir> <outDir> [names]`, run its DuckDB oracle from
oracle_sql.json over the same parquet tables and compare rows/schema/values
(columns sorted by name, rows sorted by all columns) — so oracle mismatches
surface before the round's driver run, not after.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [name ...]
"""
import sys, json, glob, os
import duckdb, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for qdir in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir) or (names and name not in names):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"{name}: NO OUTPUT")
            fails += 1
            continue
        s = pd.read_parquet(qdir)
        if name not in oracles:
            print(f"{name}: no_oracle ({len(s)} rows)")
            continue
        try:
            o = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            fails += 1
            continue
        s, o = canon(s), canon(o)
        if list(s.columns) != list(o.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
            fails += 1
            continue
        if len(s) != len(o):
            print(f"{name}: ROWS MISMATCH spark={len(s)} oracle={len(o)}")
            fails += 1
            continue
        bad = []
        for c in s.columns:
            sc, oc = s[c], o[c]
            try:
                eq = (sc.astype(str) == oc.astype(str)) | (sc.isna() & oc.isna())
            except Exception:
                eq = pd.Series([str(a) == str(b) for a, b in zip(sc, oc)])
            if not eq.all():
                i = eq[~eq].index[0]
                bad.append((c, i, oc[i], sc[i]))
        if bad:
            print(f"{name}: VALUE MISMATCH {[(c, int(i)) for c, i, _, _ in bad]}")
            for c, i, ov, sv in bad[:5]:
                print(f"    col {c} row {i}: oracle={ov!r} spark={sv!r}")
            fails += 1
        else:
            print(f"{name}: OK ({len(s)} rows)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
