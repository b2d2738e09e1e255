#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (t2).

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dir in verify_out_dir, runs oracle_sql.json[name]
in DuckDB with views over <sf_dir>/*.parquet, then compares:
  - row count
  - sorted-by-name column sets
  - a hash over all values (columns sorted by name, rows sorted)
This is builder-side tooling only (driver-side python env), NOT product code.
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray':
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def frame_hash(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted("|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode()); h.update(b"\n")
    return h.hexdigest()

def main(outdir, sfdir):
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = [d for d in sorted(os.listdir(outdir))
             if os.path.isdir(os.path.join(outdir, d))]
    n_pass = n_fail = n_weak = 0
    for name in names:
        spark_df = pq.read_table(os.path.join(outdir, name)).to_pandas()
        if name not in oracle:
            status = "WEAK-OK" if len(spark_df) > 0 else "WEAK-EMPTY"
            n_weak += 1
            print(f"  {name:28s} {status} rows={len(spark_df)} (no oracle)")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  {name:28s} ORACLE-ERROR {e}")
            n_fail += 1
            continue
        ok_rows = len(spark_df) == len(duck_df)
        ok_cols = sorted(spark_df.columns) == sorted(duck_df.columns)
        ok_hash = ok_rows and ok_cols and frame_hash(spark_df) == frame_hash(duck_df)
        if ok_hash:
            n_pass += 1
            print(f"  {name:28s} PASS rows={len(spark_df)}")
        else:
            n_fail += 1
            print(f"  {name:28s} FAIL rows={len(spark_df)}/{len(duck_df)} cols_ok={ok_cols}")
            if ok_cols and ok_rows:
                cols = sorted(spark_df.columns)
                s = spark_df[cols].map(norm_cell).apply(lambda r: "|".join(r), axis=1).sort_values().reset_index(drop=True)
                d = duck_df[cols].map(norm_cell).apply(lambda r: "|".join(r), axis=1).sort_values().reset_index(drop=True)
                diff = s[s != d]
                for i in diff.index[:3]:
                    print(f"    spark: {s[i][:200]}")
                    print(f"    duck : {d[i][:200]}")
            elif not ok_cols:
                print(f"    spark cols: {sorted(spark_df.columns)}")
                print(f"    duck  cols: {sorted(duck_df.columns)}")
    print(f"PASS={n_pass} FAIL={n_fail} WEAK={n_weak}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
