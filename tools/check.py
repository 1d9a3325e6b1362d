#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
SQL from oracle_sql.json in DuckDB over the sfDir parquet tables, sorts
columns by name, sorts rows, and compares values.

Strictness (matches the driver, which hashes rendered values):
  1. LINT pre-pass: any oracle query whose DuckDB result schema contains
     HUGEINT/UHUGEINT fails outright — DuckDB promotes SUM(BIGINT) to
     HUGEINT, pandas renders it float64, and the driver then hashes
     `506627.0` against Spark's int64 `506627`. The oracle SQL must
     CAST(... AS BIGINT). This is the round-11 failure mode (4 gates
     shipped value-correct but hash-red).
  2. dtype-kind compare: after the exact value compare, the pandas dtype
     KIND (int vs float vs object/string vs bool vs datetime) of every
     column must match between the Spark output and the DuckDB result —
     a float64 column hashes differently from an int64 column even when
     every value is numerically equal.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def kind(dtype) -> str:
    """Collapse pandas dtype to the equivalence class the driver's value
    hash actually distinguishes: ints of any width hash the same, but
    int-vs-float (5 vs 5.0) and numeric-vs-string do not."""
    k = getattr(dtype, "kind", "O")
    if k == "u":
        return "i"
    return k

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = {s.strip() for s in os.environ.get("SPARK_GRAFT_ONLY", "").split(",")
            if s.strip()}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}

    # --- LINT pre-pass: oracle result schemas must not contain HUGEINT ---
    n_lint = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            for col, typ in zip(rel.columns, rel.types):
                t = str(typ).upper()
                if "HUGEINT" in t:
                    print(f"LINT FAIL {name}: column `{col}` is {t} — "
                          f"wrap the aggregate in CAST(... AS BIGINT) "
                          f"(pandas renders int128 as float64, so the "
                          f"driver's hash will mismatch Spark's int64)")
                    n_lint += 1
        except Exception as e:
            # planning errors surface in the main loop with full context
            pass

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in
                                   sorted(glob.glob(spark_path + "/*.parquet"))]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # exact value compare (same spirit as a hash compare)
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:2000]}")
            n_fail += 1
            continue
        # strict dtype-kind compare — the driver hashes rendered values,
        # so int64 5 vs float64 5.0 is a hash mismatch even though the
        # exact compare above passed
        bad_kinds = [(c, str(got[c].dtype), str(want[c].dtype))
                     for c in got.columns
                     if kind(got[c].dtype) != kind(want[c].dtype)]
        if bad_kinds:
            print(f"FAIL {name}: dtype kind mismatch (spark vs oracle): "
                  f"{bad_kinds}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_lint} lint ==")
    sys.exit(1 if (n_fail or n_lint) else 0)

main()
