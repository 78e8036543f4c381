"""Local replica of the driver's correctness gate: run every registry
query on Spark AND its DuckDB oracle on the same parquet tables, compare
row count, column names, and order-insensitive values.

Usage: python tools/verify_oracle.py [sf_dir] [query_name ...]

Also enforces a per-query wall budget (PER_QUERY_BUDGET_SEC): the driver
samples ~50 registry queries per round, so every query must stay cheap at
sf0.01 or a future sampled set goes red on host weather alone.  A query
over budget is reported as a failure even when its values match.  The
budget is weather-scaled by the single-thread calibration (same protocol
as bench.py): this VM's CPU steal swings walls up to 4×, and a fixed
20 s flapped on a different heavy-but-healthy query each full run.
"""

from __future__ import annotations

import gc as _gc
import os
import sys
import time

import duckdb
import pandas as pd

# generous vs the ~5s worst case observed on an idle box; catches a query
# that grows into a multi-minute outlier without flapping on CPU steal
PER_QUERY_BUDGET_SEC = float(os.environ.get("SPARK_GRAFT_QUERY_BUDGET", "20"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b):
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        except AssertionError as e:
            problems.append(f"values: {str(e).splitlines()[-1][:300]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from pdf_ocr_spark.pipeline.session import get_spark
    from pdf_ocr_spark.queries import REGISTRY

    spark = get_spark(app_name="verify-oracle", cores=8, shuffle_partitions=8)
    con = duckdb_con(sf_dir)
    from bench import cpu_calibration

    cal = cpu_calibration()
    budget = PER_QUERY_BUDGET_SEC * max(1.0, cal / 0.961)  # nominal = idle box
    if budget > PER_QUERY_BUDGET_SEC:
        print(f"(weather: calibration {cal:.3f}s → budget {budget:.1f}s)")
    failures = {}
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        # each query starts clean: ~20 registry queries persist()
        # fixtures/intermediates, and 200+ queries in ONE session also
        # accumulate un-GC'd broadcasts/localCheckpoint blocks whose
        # cleanup (ContextCleaner) only runs on a JVM GC — late
        # broadcast-heavy queries (observed: link_hits, ~5s alone vs
        # ~26s mid-suite) stall on driver pauses otherwise.  Python gc
        # first so py4j refs release, then an explicit JVM GC.
        spark.catalog.clearCache()
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        try:
            t0 = time.monotonic()
            sdf = fn(spark, sf_dir).toPandas()
            elapsed = time.monotonic() - t0
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"spark error: {type(e).__name__}: {str(e)[:200]}"]
            print(f"FAIL {name}: {failures[name][0]}")
            continue
        if elapsed > budget:
            # confirm before failing: a steal spike mid-suite inflates one
            # query; a real regression reproduces on the immediate retry
            t0 = time.monotonic()
            sdf = fn(spark, sf_dir).toPandas()
            retry = time.monotonic() - t0
            if retry > budget:
                failures[name] = [
                    f"budget: {elapsed:.1f}s then {retry:.1f}s > {budget:.1f}s "
                    f"at {sf_dir}"
                ]
                print(f"FAIL {name}: {failures[name][0]}")
                continue
            print(f"(budget retry: {name} {elapsed:.1f}s → {retry:.1f}s, ok)")
        if sql is None:
            status = "rows-only"
            print(f"ok   {name}: {len(sdf)} rows ({status})")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"oracle error: {type(e).__name__}: {str(e)[:200]}"]
            print(f"FAIL {name}: {failures[name][0]}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures[name] = problems
            print(f"FAIL {name}: {problems}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match oracle")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {sorted(failures)}")
        return 1
    print("\nall queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
