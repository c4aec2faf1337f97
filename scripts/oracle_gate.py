#!/usr/bin/env python
"""Replica of the driver's correctness gate at an arbitrary SF.

Usage: python scripts/oracle_gate.py [/root/testdata/sf0.01] [query ...]
Extra args restrict the run to those query names (default: all).
Prints one line per query: OK / MISMATCH / ERROR, then a summary.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as E


def _type_class(t: str) -> str:
    """Collapse an engine type name to the class the driver's value hash is
    sensitive to.  DuckDB HUGEINT (int128, e.g. from an uncast sum() over
    integers) gets its OWN class: Python fetchall() collapses it to int so
    value comparison can't see it, but the driver hashes typed/serialized
    values and diverges (the r2 crawl_counters failure)."""
    t = t.lower().split("(")[0].strip()
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "int8",
             "int16", "int32", "int64", "utinyint", "usmallint", "uinteger",
             "ubigint", "long", "short", "byte"):
        return "int"
    if t in ("hugeint", "int128", "uhugeint"):
        return "hugeint"
    if t in ("float", "double", "real"):
        return "float"
    if t in ("varchar", "string", "text", "char"):
        return "string"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith("timestamp"):  # driver hash proved ntz/ltz-insensitive (r2)
        return "timestamp"
    return t


def type_mismatches(qdf, con, sql):
    """Column-name → (spark_class, duck_class) for every class divergence."""
    spark_t = {f.name.lower(): _type_class(f.dataType.simpleString())
               for f in qdf.schema.fields}
    duck_t = {r[0].lower(): _type_class(r[1])
              for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    return {c: (spark_t[c], duck_t[c])
            for c in spark_t if c in duck_t and spark_t[c] != duck_t[c]}


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            vals.append(round(v, 6) if isinstance(v, float) else str(v))
        out.append(tuple(vals))
    return sorted(out, key=str)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from thecrowler_spark.session import get_spark

    spark = get_spark(app_name="oracle-gate", cores=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    queries, oracles = E.queries(), E.oracle_sql()
    ok = bad = err = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            qdf = queries[name](spark, sf_dir)
            spark_cols = [c.lower() for c in qdf.columns]
            spark_rows = [tuple(r) for r in qdf.collect()]
            if name not in oracles:
                print(f"{name}: ROWS_ONLY ({len(spark_rows)} rows)")
                ok += 1
                continue
            con = duckdb.connect()
            for t in E.TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
            res = con.execute(oracles[name])
            duck_cols = [d[0].lower() for d in res.description]
            duck_rows = res.fetchall()
            tmis = type_mismatches(qdf, con, oracles[name])
            if sorted(spark_cols) != sorted(duck_cols):
                print(f"{name}: MISMATCH cols {spark_cols} vs {duck_cols}")
                bad += 1
            elif tmis:
                print(f"{name}: MISMATCH types {tmis}")
                bad += 1
            elif len(spark_rows) != len(duck_rows):
                print(f"{name}: MISMATCH rows {len(spark_rows)} vs {len(duck_rows)}")
                bad += 1
            elif canon(spark_rows, spark_cols) != canon(duck_rows, duck_cols):
                g, w = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
                diff = [(a, b) for a, b in zip(g, w) if a != b][:2]
                print(f"{name}: MISMATCH values, first {diff}")
                bad += 1
            else:
                print(f"{name}: OK ({len(spark_rows)} rows)")
                ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
            err += 1
    print(f"SUMMARY sf_dir={sf_dir}: {ok} ok, {bad} mismatch, {err} error")
    spark.stop()


if __name__ == "__main__":
    main()
