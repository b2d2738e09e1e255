#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles before the driver's DuckDB compare.

Usage: python3 tools/oracle_precheck.py <sfDir> <verifyOutDir>

Mimics the driver: for each query with an oracleSql entry, run the SQL in
DuckDB over the same parquet tables, sort columns by name, sort rows, and
compare cell values (floats with rel tolerance) against the Spark parquet
dump written by graft.Verify.

GRAFT_EXACT=1 is the gate (bit-for-bit, like the driver's hash).
The default tolerance mode is a TRIAGE aid only: rows are sorted
per-side on rounded values, so two rows whose float columns differ
within tolerance can sort in different orders across engines and
zip-compare as a spurious FAIL — read its diffs as hints, trust EXACT.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v if EXACT else float(f"{v:.9g}")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


EXACT = os.environ.get("GRAFT_EXACT") == "1"


def close(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, (int, float)):
        if a == b:
            return True
        if EXACT:
            return False
        return math.isclose(a, float(b), rel_tol=1e-7, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, (int, float)):
        return close(b, a)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return a == b


def fetch_sorted(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: json.dumps(t, default=str))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # builder-side triage aid: GRAFT_ONLY=q_a,q_b restricts the compare
    # (pairs with SPARK_GRAFT_VERIFY_ONLY on the Verify side); the
    # rows-only sweep is restricted too so absent dumps don't FAIL
    only = os.environ.get("GRAFT_ONLY")
    want = {x.strip() for x in only.split(",") if x.strip()} if only else None
    if want is not None:
        oracles = {k: v for k, v in oracles.items() if k in want}
    failures = 0
    for name in sorted(oracles):
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output (query crashed in Verify?)")
            failures += 1
            continue
        try:
            ocols, orows = fetch_sorted(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            scols, srows = fetch_sorted(
                con, f"SELECT * FROM read_parquet('{spark_glob}')")
        except Exception as e:
            print(f"FAIL {name}: spark parquet read error: {e}")
            failures += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if not close(a, b)]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first:")
            print(f"  spark:  {bad[0][0]}")
            print(f"  oracle: {bad[0][1]}")
            failures += 1
            continue
        print(f"ok   {name}: {len(srows)} rows")
    # rows-only check for queries with no oracle: rows > 0 REQUIRED
    # (a zero-row dump is a broken query, and must fail the gate)
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if want is not None and d not in want:
            continue
        if os.path.isdir(full) and d not in oracles:
            g = os.path.join(full, "*.parquet")
            n = 0
            if glob.glob(g):
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{g}')").fetchone()[0]
            if n == 0:
                print(f"FAIL rows-only {d}: 0 rows")
                failures += 1
            else:
                print(f"rows-only {d}: ok ({n} rows)")
    print(f"\n{failures} failure(s) of {len(oracles)} oracle queries")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
