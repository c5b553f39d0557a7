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


def col_types(con, sql):
    """name -> DuckDB type for a query's result set, via DESCRIBE.

    The driver's value hash is TYPE-sensitive: DuckDB sum(BIGINT/INT)
    returns HUGEINT (windowed sums too) while Spark emits int64, and the
    round-4 driver flagged exactly the 12 oracles whose DESCRIBE showed a
    HUGEINT column even though Python-value comparison passed. Comparing
    DESCRIBE types between the oracle SQL and the Spark parquet makes this
    failure class visible locally.
    """
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE ({sql})").fetchall()}


def type_family(t):
    """Collapse DuckDB types into the families the driver's hash actually
    distinguishes. Round-4 evidence: INTEGER-vs-BIGINT columns (Spark
    row_number is int32, DuckDB's is int64) were hash-GREEN, while every
    HUGEINT column was hash-RED — the driver normalizes integer widths to
    int64 but converts HUGEINT to float64/decimal, changing the hashed
    value representation. So widths within a family are equivalent;
    HUGEINT/DECIMAL are their own (always-mismatching) families."""
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    return t  # HUGEINT, UBIGINT, DECIMAL(...), VARCHAR, DATE, ... exact


def type_mismatches(otypes, stypes):
    """Per-column DuckDB type-family diffs the driver hash would reject."""
    bad = []
    for c in sorted(set(otypes) & set(stypes)):
        ot, st = otypes[c], stypes[c]
        if type_family(ot) != type_family(st):
            bad.append((c, ot, st))
    return bad


def lint(sf_dir, out_dir):
    """DESCRIBE every oracle and fail on output types Spark can never emit.

    DuckDB sum(INT/BIGINT) — windowed sums included — yields HUGEINT; Spark
    has no 128-bit integer, so a HUGEINT (or UHUGEINT) column in an oracle's
    OUTPUT schema is always a driver hash-red waiting to happen. Unlike a
    syntactic "uncast sum" lint (99 false positives on this registry: interior
    CTE sums consumed by float math are fine), DESCRIBE is exact. Needs only
    oracle_sql.json, not a Spark Verify pass.
    """
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table dir (e.g. a ScaleUp corpus)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_bad = 0
    for name in sorted(oracle):
        try:
            types = col_types(con, oracle[name])
        except Exception as e:
            print(f"ERR   {name}: describe: {e}")
            n_bad += 1
            continue
        bad = {c: t for c, t in types.items() if "HUGEINT" in t}
        if bad:
            print(f"LINT  {name}: un-Spark-able oracle output types: {bad}")
            n_bad += 1
    print(f"== lint: {n_bad} oracle(s) with HUGEINT output ==")
    return 1 if n_bad else 0


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table dir (e.g. a ScaleUp corpus)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    only = None
    import os
    if os.environ.get("SPARK_GRAFT_ONLY"):
        only = set(os.environ["SPARK_GRAFT_ONLY"].split(","))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
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
        try:
            tbad = type_mismatches(
                col_types(con, oracle[name]),
                col_types(con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"))
        except Exception as e:
            print(f"ERR   {name}: describe: {e}")
            n_fail += 1
            continue
        if tbad:
            print(f"FAIL  {name}: type mismatch (driver hash is type-sensitive):")
            for c, ot, st in tbad:
                print(f"      {c}: oracle={ot} spark={st}")
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
    if "--lint" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--lint"]
        sys.exit(lint(args[0], args[1]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
