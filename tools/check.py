#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped
by graft.Verify, run the DuckDB oracle SQL over the same parquet tables
and compare (columns sorted by name, rows sorted, values hashed).

Usage: python3 tools/check.py [verify_out_dir] [sf_dir]
"""
import json, sys, math

import duckdb

VERIFY_OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bool):
        return str(v)
    return str(v)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.load(open(f"{VERIFY_OUT}/oracle_sql.json"))
    n_ok = n_bad = 0
    # When graft.Verify ran with a name filter (fast single-oracle
    # iteration), manifest.json lists only the queries actually run —
    # restrict the compare to those instead of FAILing the other 200.
    try:
        run_manifest = set(json.load(open(f"{VERIFY_OUT}/manifest.json")))
        if run_manifest:
            oracle = {k: v for k, v in oracle.items() if k in run_manifest}
    except Exception:
        pass
    # Spark-side analysis failures recorded by graft.Verify: every entry
    # here is a declared query that produced NO dump — emit an err row so
    # a broken query can never silently vanish from the accounting.
    try:
        spark_errors = json.load(open(f"{VERIFY_OUT}/errors.json"))
    except Exception:
        spark_errors = {}
    for name, msg in sorted(spark_errors.items()):
        print(f"FAIL {name}: spark-side error: {msg[:200]}")
        n_bad += 1
    for name, sql in sorted(oracle.items()):
        if name in spark_errors:
            continue  # already reported as a spark-side err row above
        try:
            got = con.execute(
                f"SELECT * FROM '{VERIFY_OUT}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        # Mirror the driver's pandas sort_values pass: it raises on
        # non-hashable cell types (numpy arrays from LIST/MAP columns),
        # so any query emitting those must fail HERE, not on the driver.
        try:
            got.sort_values(by=sorted(got.columns))
        except Exception as e:
            print(f"FAIL {name}: driver-style sort_values would fail "
                  f"(non-scalar column?): {type(e).__name__}: {e}")
            n_bad += 1
            continue
        # The driver's two readers render DECIMAL cells differently
        # (decimal.Decimal "0.00" vs float "0.0"), so a decimal-typed
        # output column hash-mismatches driver-side even when every
        # value is equal (bitten once: x6_charge_decimal r6). fetchdf
        # hides this (decimals -> float64), so check the DECLARED types:
        # final outputs must be double/int/string/date on both sides.
        deccols = []
        for label, src in (("spark", f"SELECT * FROM "
                            f"'{VERIFY_OUT}/{name}/*.parquet'"),
                           ("oracle", sql)):
            for cname, ctype, *_ in con.execute(
                    f"DESCRIBE {src}").fetchall():
                if "DECIMAL" in ctype.upper():
                    deccols.append(f"{label}.{cname}:{ctype}")
        if deccols:
            print(f"FAIL {name}: decimal-typed output column(s) "
                  f"{deccols} — cast to DOUBLE/VARCHAR on both sides")
            n_bad += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        g = got[gc].values.tolist()
        e = exp[ec].values.tolist()
        g = sorted([tuple(canon(v) for v in row) for row in g])
        e = sorted([tuple(canon(v) for v in row) for row in e])
        if g != e:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: "
                  f"{bad[0] if bad else '(order only)'}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(g)} rows)")
        n_ok += 1
    # rows-only queries (no oracle): just confirm non-error dump exists
    import os
    for d in sorted(os.listdir(VERIFY_OUT)):
        path = os.path.join(VERIFY_OUT, d)
        if os.path.isdir(path) and d not in oracle:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
                print(f"rows {d} ({n} rows, no oracle)")
            except Exception as e:
                print(f"FAIL {d}: rows-only dump unreadable: {e}")
                n_bad += 1
    # Completeness assertion: every name in the declared manifest must be
    # accounted for above (oracle compare, rows-only dump, or err row) —
    # a query missing from ALL channels means the harness lost it.
    try:
        manifest = set(json.load(open(f"{VERIFY_OUT}/manifest.json")))
    except Exception:
        manifest = set()
    if manifest:
        accounted = set(oracle) | set(spark_errors) | {
            d for d in os.listdir(VERIFY_OUT)
            if os.path.isdir(os.path.join(VERIFY_OUT, d))}
        lost = manifest - accounted
        for name in sorted(lost):
            print(f"FAIL {name}: declared but unaccounted (no dump, no "
                  f"oracle, no err row) — harness lost it")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, "
          f"{len(oracle)} oracle queries")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
