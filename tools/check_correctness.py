#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compares each
Verify output parquet against its DuckDB oracle at a given SF dir.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [colnames[i] for i in order], out


# Integer widths <= 64 bits hash identically driver-side (values go
# through a lossless int64 path); HUGEINT / DECIMAL / FLOAT-vs-DOUBLE
# do NOT — the driver's hash is type-sensitive there (r7 shipped three
# hash-red rows whose values matched but whose oracle columns were
# int128). Normalize the narrow-int family, treat everything else
# verbatim so wide-type drift fails locally before the driver sees it.
NARROW_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"}


def canon_type(t):
    return "INT64" if t in NARROW_INTS else t


def type_mismatches(con, sql, parquet_glob):
    otypes = {c: canon_type(t) for c, t, *_ in
              con.execute(f"DESCRIBE {sql}").fetchall()}
    stypes = {c: canon_type(t) for c, t, *_ in
              con.execute(
                  f"DESCRIBE SELECT * FROM '{parquet_glob}'").fetchall()}
    return [(c, stypes[c], otypes[c]) for c in sorted(otypes)
            if c in stypes and stypes[c] != otypes[c]]


# Opt-in float slack for supra-driver-scale local sweeps (--ulp N):
# at sf1 magnitudes DuckDB's CAST(DECIMAL AS DOUBLE) can be one ulp
# off the correctly-rounded conversion Spark emits (verified on
# agg_returnflag's sum_charge). The DRIVER gate is exact; default 0
# keeps this checker identical to it.
ULP_SLACK = 0


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        if ULP_SLACK > 0 and math.isfinite(a) and math.isfinite(b):
            lo, hi = a, a
            for _ in range(ULP_SLACK):
                lo = math.nextafter(lo, -math.inf)
                hi = math.nextafter(hi, math.inf)
            return lo <= b <= hi
        return False
    return a == b or str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            s = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            n_fail += 1
            continue
        mism = type_mismatches(con, sql, f"{out_dir}/{name}/*.parquet")
        if mism:
            print(f"FAIL {name}: type drift (col, spark, oracle): {mism}")
            n_fail += 1
            continue
        _, so = canon(srows, scols)
        _, oo = canon(orows, ocols)
        if len(so) != len(oo):
            print(f"FAIL {name}: rows {len(so)} != {len(oo)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(so, oo)):
            if not all(cells_equal(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(so)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--ulp" in argv:
        i = argv.index("--ulp")
        ULP_SLACK = int(argv[i + 1])
        globals()["ULP_SLACK"] = ULP_SLACK
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1]))
