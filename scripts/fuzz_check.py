#!/usr/bin/env python3
"""Differential check for the SQL fuzzer (FuzzSpec / graft.operators.Fuzz).

Usage: python3 scripts/fuzz_check.py <sfDir> <fuzzOutDir>

Reads <fuzzOutDir>/fuzz_sql.json ({name: sql}), runs each SQL in DuckDB over
<sfDir>/*.parquet views, and compares against the Spark result parquet at
<fuzzOutDir>/<name>/ under the SAME discipline as scripts/check.py (the
driver-gate replica): sort columns by name, sort rows by all columns, dtype
kinds must match (int widths collapse), floats compare EXACT after both
sides' rounding. Prints one PASS/FAIL line per query and "== N pass, M
fail"; exit 1 on any fail.
"""
import json, sys, glob, os
import duckdb
import pandas as pd


def load(con, sfdir):
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f)[:-8]
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{f}')")


def norm(df):
    import datetime
    for c in df.columns:
        if df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and all(isinstance(v, datetime.date) for v in nn.head(5)):
                df[c] = pd.to_datetime(df[c])
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def canon_dtype(dt):
    k = getattr(dt, 'kind', None)
    if k in ('i', 'u'):
        return 'int'
    if k == 'f':
        return 'float'
    if k == 'M':
        return 'datetime'
    if k == 'b':
        return 'bool'
    return str(dt)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    sqls = json.load(open(f"{outdir}/fuzz_sql.json"))
    con = duckdb.connect()
    load(con, sfdir)
    n_pass = n_fail = 0
    for name in sorted(sqls):
        try:
            spark_df = norm(pd.read_parquet(f"{outdir}/{name}"))
            duck_df = norm(con.execute(sqls[name]).fetchdf())
            ok = True
            msgs = []
            if list(spark_df.columns) != list(duck_df.columns):
                ok = False
                msgs.append(f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            elif len(spark_df) != len(duck_df):
                ok = False
                msgs.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
            else:
                for c in spark_df.columns:
                    s, d = spark_df[c], duck_df[c]
                    if canon_dtype(s.dtype) != canon_dtype(d.dtype):
                        ok = False
                        msgs.append(f"DTYPE-DRIFT[{c}] spark={s.dtype} duck={d.dtype}")
                        continue
                    if s.dtype.kind == 'f' or d.dtype.kind == 'f':
                        sa, da = s.astype(float), d.astype(float)
                        both_nan = sa.isna() & da.isna()
                        diff = (sa - da).abs()
                        diff[both_nan] = 0.0
                        md = diff.max()
                        if not (md == 0.0 or (pd.isna(md) and both_nan.all())):
                            ok = False
                            msgs.append(f"float[{c}] maxdiff={md}")
                    else:
                        if not s.astype(str).fillna('∅').equals(d.astype(str).fillna('∅')):
                            ok = False
                            bad = (s.astype(str) != d.astype(str))
                            i = bad.idxmax()
                            msgs.append(f"val[{c}] row{i}: spark={s[i]!r} duck={d[i]!r}")
            if ok:
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: {'; '.join(msgs)}")
                print(f"  SQL: {sqls[name]}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
            print(f"  SQL: {sqls[name]}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


main()
