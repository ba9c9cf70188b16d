"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given SF, then compares: row count, column names, and
order-insensitive values (columns sorted by name, rows sorted). Reports
both exact-equality and the max float deviation, so near-misses from
summation-order differences are visible before the driver sees them.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homelogging_spark.session import get_spark
from homelogging_spark.tables import TABLE_NAMES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = pd.to_datetime(df[c])
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_localize(None)
            df[c] = dt.astype("datetime64[ns]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            import datetime

            sample = df[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (datetime.date, datetime.datetime)
            ):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> bool:
    if len(spark_pdf) != len(duck_pdf):
        print(f"  FAIL {name}: row count {len(spark_pdf)} vs {len(duck_pdf)}")
        return False
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        print(
            f"  FAIL {name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
        )
        return False
    # The driver's schema+hash checks are timezone-strict: a tz-aware
    # DuckDB TIMESTAMPTZ vs Spark's naive timestamp fails even when every
    # value is identical (the round-4 ebusd_parse bug). Fail here BEFORE
    # normalize() strips tz info, so this gate predicts the driver.
    tz_ok = True
    for c in sorted(spark_pdf.columns):
        sa, sb = spark_pdf[c], duck_pdf[c]
        if pd.api.types.is_datetime64_any_dtype(sa) or pd.api.types.is_datetime64_any_dtype(sb):
            a_tz = getattr(getattr(sa, "dtype", None), "tz", None)
            b_tz = getattr(getattr(sb, "dtype", None), "tz", None)
            if (a_tz is None) != (b_tz is None):
                tz_ok = False
                print(
                    f"  col {c}: tz-awareness mismatch spark={sa.dtype} duck={sb.dtype}"
                    " (driver schema/hash is tz-strict — CAST the oracle to naive TIMESTAMP)"
                )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    ok = tz_ok
    max_dev = 0.0
    for c in a.columns:
        # The driver's value hash is dtype-strict: int64 3 != float64 3.0.
        # Fail on int-vs-float mismatches instead of silently coercing, so
        # this local gate predicts the driver (the round-1 all_gate bug).
        if pd.api.types.is_integer_dtype(a[c]) != pd.api.types.is_integer_dtype(b[c]):
            ok = False
            print(
                f"  col {c}: dtype mismatch spark={a[c].dtype} duck={b[c].dtype}"
                " (driver hash distinguishes int from float — CAST the oracle)"
            )
            continue
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = a[c].astype(float).to_numpy()
            bv = b[c].astype(float).to_numpy()
            nan_match = np.array_equal(np.isnan(av), np.isnan(bv))
            dev = np.nanmax(np.abs(av - bv)) if len(av) else 0.0
            if not nan_match or (len(av) and not np.array_equal(
                np.nan_to_num(av), np.nan_to_num(bv)
            )):
                max_dev = max(max_dev, float(dev) if dev == dev else np.inf)
                if not nan_match or dev > 0:
                    ok = False
                    print(f"  col {c}: max abs deviation {dev!r} nan_match={nan_match}")
        else:
            if not a[c].equals(b[c]):
                ok = False
                diff = (a[c] != b[c]) | (a[c].isna() != b[c].isna())
                idx = diff[diff].index[:3]
                print(f"  col {c}: mismatch at rows {list(idx)}:")
                for i in idx:
                    print(f"    spark={a[c][i]!r} duck={b[c][i]!r}")
    if ok:
        return True
    print(f"  FAIL {name}: value mismatch (max float dev {max_dev!r})")
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    from homelogging_spark.functions.cachelife import release_caches

    n_pass = n_fail = n_noora = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spark_pdf = sdf.toPandas()
        t_spark = time.time() - t0
        release_caches()
        if name not in oracles:
            print(f"  rows-only {name}: {len(spark_pdf)} rows ({t_spark:.1f}s)")
            n_noora += 1
            continue
        duck_pdf = con.execute(oracles[name]).fetchdf()
        if compare(name, spark_pdf, duck_pdf):
            print(f"  PASS {name}: {len(spark_pdf)} rows ({t_spark:.1f}s spark)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
