"""Capture .explain("formatted") output for registered queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: all).
Planning only — no query is executed, so this is safe to run on a busy
box (first-touch fixture builds ARE executed if the sf fixtures are
cold; run check_oracle or the bench once first to warm them).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homelogging_spark.session import get_spark


def explain_str(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if names:
        missing = [n for n in names if n not in qs]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
    else:
        names = list(qs)

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("homelogging-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        df = qs[n](spark, sf_dir)
        txt = explain_str(df)
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
