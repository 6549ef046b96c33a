#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views over <sfDir>, sorts
columns by name and rows by value, and reports exact-match / near-miss /
mismatch per query. NOT part of the shipped library — local validation only.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if hasattr(v, "__float__") and type(v).__name__ == "Decimal":
        return float(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def values_close(a, b):
    if type(a) is float or type(b) is float:
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = got_rel.columns
            got_rows = [tuple(r) for r in got_rel.df().itertuples(index=False)]
            exp_rel = con.sql(sql)
            exp_cols = exp_rel.columns
            # .df() mirrors the driver's pandas fetch: DuckDB HUGEINT (SUM of
            # any integer type) becomes float64 and would hash-mismatch the
            # Spark BIGINT — fetching the same way catches that locally.
            exp_rows = [tuple(r) for r in exp_rel.df().itertuples(index=False)]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            print(f"FAIL {name}: columns {gc} vs {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}")
            n_fail += 1
            continue
        # stringified compare mirrors the driver's value-hash: int 7949 vs
        # float 7949.0 are == in Python but hash differently as strings
        exact = [tuple(str(x) for x in r) for r in gr] == \
            [tuple(str(x) for x in r) for r in er]
        if exact:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
            continue
        # diagnose: near-miss (float noise) or true mismatch
        bad = None
        for i, (g, e) in enumerate(zip(gr, er)):
            if g != e and not all(values_close(a, b) for a, b in zip(g, e)):
                bad = (i, g, e)
                break
        if bad is None:
            diff = next(((g, e) for g, e in zip(gr, er)
                         if tuple(map(str, g)) != tuple(map(str, e))), None)
            print(f"NEAR {name}: type/float noise only ({len(gr)} rows) "
                  f"— first diff {diff}")
            n_fail += 1
        else:
            print(f"FAIL {name}: row {bad[0]}\n  got {bad[1]}\n  exp {bad[2]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
