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
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:  # sortable sentinel: rows with NULLs must not crash the sort
        return "\x00<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


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
            drows = res.fetchall()
            dpdf = con.execute(oracles[name]).df()
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
        # hard failure; anything else prints a note.
        def _kind(dt):
            k = dt.kind
            return {"i": "int", "u": "int", "f": "float", "M": "datetime", "m": "timedelta"}.get(k, "object")

        dt_bad, dt_note = [], []
        for c in pdf.columns:
            if c not in dpdf.columns or pdf[c].dtype == dpdf[c].dtype:
                continue
            ks, kd = _kind(pdf[c].dtype), _kind(dpdf[c].dtype)
            item = (c, str(pdf[c].dtype), str(dpdf[c].dtype))
            if {ks, kd} == {"int", "float"}:
                dt_bad.append(item)
            else:
                dt_note.append(item)
        if dt_bad:
            failures.append((name, f"int/float kind mismatch: {dt_bad}"))
            print(f"FAIL {name}: int vs float dtype kind (spark vs duckdb): {dt_bad}")
            continue
        if dt_note:
            print(f"note {name}: benign dtype width diff: {dt_note}")
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
