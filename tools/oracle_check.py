#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only; the
shipped library is pure Scala/Spark).

usage: oracle_check.py <sfDir> <verifyOutDir> [queryName ...]

<verifyOutDir> is what `sbt "runMain graft.Verify <sfDir> <outDir>"` wrote:
one parquet dir per query + oracle_sql.json. We compare strictly (exact
values after the queries' own rounding), so anything that passes here passes
any tolerant driver compare too.
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # date objects / Decimals → string for stable compare
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pq.read_table(p).to_pandas() for p in files])
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            n_fail += 1
            continue
        # dtype-kind guard BEFORE normalization: catches the width-drift bug
        # class (DuckDB HUGEINT/DECIMAL widened to float64 vs Spark int64 —
        # hash-differs in the driver even when every value matches) loudly at
        # authoring time. Kinds: integer/float/bool/datetime/object; int
        # width differences (int32 vs int64) are fine, int-vs-float is not.
        kind = lambda s: {"u": "i", "S": "O", "U": "O"}.get(s.dtype.kind, s.dtype.kind)
        bad_dtypes = [
            f"{c}: spark={got[c].dtype}({kind(got[c])}) oracle={exp[c].dtype}({kind(exp[c])})"
            for c in sorted(got.columns) if kind(got[c]) != kind(exp[c])]
        if bad_dtypes:
            print(f"FAIL {name}: DTYPE drift — " + "; ".join(bad_dtypes))
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        ok = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_float_dtype(gv):
                same = np.isclose(gv.fillna(np.nan), ev.fillna(np.nan),
                                  rtol=0, atol=0, equal_nan=True)
                exact = bool(same.all())
                close = bool(np.isclose(gv.fillna(np.nan), ev.fillna(np.nan),
                                        rtol=1e-9, atol=1e-9, equal_nan=True).all())
                if not exact:
                    bad = int((~same).sum())
                    print(f"  {name}.{c}: {bad} inexact float rows (close={close})")
                    if not close:
                        ok = False
                    else:
                        ok = False  # strict: driver may hash exactly
            else:
                same = (gv.fillna("\0NULL") == ev.fillna("\0NULL"))
                if not bool(same.all()):
                    i = int(np.argmax(~same.values))
                    print(f"  {name}.{c}: mismatch at sorted-row {i}: spark={gv.iloc[i]!r} oracle={ev.iloc[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
