#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sfDir parquet tables registered as views, and compares against the
Spark-written parquet at <verifyOutDir>/<name>/ — rows sorted, columns
sorted by name, values compared exactly (floats to 9 significant digits).

Dev-only tooling; NOT part of the Scala library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # the "f:" tag makes float-vs-int mismatches FAIL here like they
        # fail the driver's value hash (e.g. DuckDB windowed sum(BIGINT)
        # surfacing as HUGEINT→float64 while Spark emits int64)
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"MISS  {name}: no spark output")
            n_fail += 1
            continue
        try:
            o = con.execute(oracle[name])
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
            s = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_fail += 1
            continue
        oc, orows = canon(ocols, orows)
        sc, srows = canon(scols, srows)
        if oc != sc:
            print(f"FAIL  {name}: column mismatch spark={sc} oracle={oc}")
            n_fail += 1
        elif orows != srows:
            n_fail += 1
            print(f"FAIL  {name}: rows spark={len(srows)} oracle={len(orows)}")
            only_s = [r for r in srows if r not in set(orows)][:3]
            only_o = [r for r in orows if r not in set(srows)][:3]
            for r in only_s:
                print(f"      spark-only: {r}")
            for r in only_o:
                print(f"      oracle-only: {r}")
        else:
            n_pass += 1
            print(f"PASS  {name}: {len(srows)} rows")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
