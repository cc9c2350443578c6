"""Local stand-in for the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir; compare row count, column names, and order-insensitive
values.

Mirrors the driver harness deliberately:

- VANILLA SparkSession (no engine session.py configs — Spark 4 default
  ANSI mode, default mapKeyDedupPolicy), because the driver builds its
  own session; round-1 had 3 gate rows fail only under the driver's
  config.
- ``toPandas()`` + ``sort_values`` canonicalization, so array-typed
  output columns raise the same "unhashable type: 'list'" the driver
  hits.

Usage: python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import numbers
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    """Type-tagged (sort_class, value) tuples so mixed cells in one
    column — NULL vs number, NaN vs number — sort without TypeError.
    A bare string sentinel only survives next to other strings; a null
    in a double column crashed the sort it claimed to fix."""
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, int(v))
    if isinstance(v, float):  # covers np.float64 (a float subclass)
        if math.isnan(v):
            return (3, "nan")
        return (1, round(v, 9))
    if isinstance(v, numbers.Number):  # int, np.int*, Decimal — numeric class shared with float
        return (1, v)
    if hasattr(v, "isoformat"):
        return (2, v.isoformat())
    if isinstance(v, (list, tuple)):
        return (4, tuple(norm_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return (5, bytes(v))
    return (2, v) if isinstance(v, str) else (6, str(v))


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    manifest = Path(__file__).resolve().parents[1] / "fixtures" / "MANIFEST.json"
    if manifest.exists():
        import json

        fx_sf = json.loads(manifest.read_text()).get("sf_dir")
        if fx_sf and Path(fx_sf).resolve() != Path(sf_dir).resolve():
            print(
                f"WARNING: fixture oracles were generated for {fx_sf}, not {sf_dir} — "
                f"fixture-backed queries WILL mismatch; regenerate with "
                f"`python tools/make_fixtures.py {sf_dir}`"
            )

    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            # driver-style canonicalization: toPandas + sort by every
            # column (raises on unhashable cells, like the driver)
            pdf = sdf.toPandas()
            pdf = pdf[sorted(pdf.columns)]
            if len(pdf):
                pdf.sort_values(by=list(pdf.columns))
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            dtypes = [str(d[1]) for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            continue
        # Dtype-KIND check: the driver's value hash is dtype-sensitive
        # after toPandas() — DuckDB HUGEINT→pandas float64 (42.0) vs
        # Spark int64 (42) caused the round-2 field_success_rates hash
        # mismatch even though the VALUES compared equal here. Width and
        # temporal-unit differences (int32 vs int64, datetime64[ns] vs
        # [us], date-as-object vs datetime64) all passed the r2 driver
        # hash, so only a numeric-KIND disagreement (int vs float) is a
        # hard failure. DuckDB's pandas kind is derived from the result
        # DESCRIPTION (its documented ->pandas mapping) rather than by
        # executing the oracle a second time for a .df().
        def _kind(dt):
            k = dt.kind
            return {"i": "int", "u": "int", "f": "float"}.get(k, "other")

        def _duck_kind(tname):
            t = str(tname).upper()
            if t.startswith("DECIMAL") or t in ("FLOAT", "DOUBLE", "REAL", "HUGEINT", "UHUGEINT"):
                return "float"  # HUGEINT/DECIMAL land in pandas as float64
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            return "other"

        duck_kinds = dict(zip(dcols, (_duck_kind(t) for t in dtypes)))
        dt_bad = []
        for c in pdf.columns:
            ks, kd = _kind(pdf[c].dtype), duck_kinds.get(c, "other")
            if {ks, kd} == {"int", "float"}:
                dt_bad.append((c, str(pdf[c].dtype), duck_kinds.get(c)))
        if dt_bad:
            failures.append((name, f"int/float kind mismatch: {dt_bad}"))
            print(f"FAIL {name}: int vs float dtype kind (spark vs duckdb): {dt_bad}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"row count {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: row count {len(srows)} vs {len(drows)}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"cols {sorted(scols)} vs {sorted(dcols)}"))
            print(f"FAIL {name}: cols {sorted(scols)} vs {sorted(dcols)}")
            continue
        _, skey = frame_key(scols, [[r[c] for c in scols] for r in srows])
        _, dkey = frame_key(dcols, drows)
        if skey != dkey:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(skey, dkey)) if a != b)
            failures.append((name, f"value mismatch at sorted row {diff[0]}"))
            print(f"FAIL {name}: first diff at sorted row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
            continue
        print(f"ok   {name}: {len(srows)} rows, values match")

    print(f"\n{len(failures)} failures / {len(qs) if not only else len(only)} queries")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
