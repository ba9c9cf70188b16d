"""Benchmark harness (driver contract).

Runs the registered headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count + a cheap full materialization
via write to a noop-ish action) but not collected to the driver in full —
we time the plan execution, not pandas conversion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from homelogging_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    spark = get_spark("homelogging-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not first-touch costs.
    from homelogging_spark.tables import load_table

    load_table(spark, sf_dir, "events").count()
    load_table(spark, sf_dir, "lineitem").count()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        # Execute the full plan; count() after a noop cache-less pass only
        # schedules an aggregate, so force all columns with a summary-free
        # action: write.format("noop") executes every operator.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
