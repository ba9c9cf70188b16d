"""Per-query cost decomposition: DataFrame construction (py4j +
analysis) vs first noop execution vs warm re-execution.

Usage: python tools/profile_query.py <query> [query ...]

For each query, times:
  build    — fn(spark, sf_dir) returning the DataFrame (Python-side
             plan construction, py4j traffic, analysis trigger)
  exec1    — first .write.format('noop') on that frame (codegen + run)
  rebuild  — a second fn() call (warm JVM, fresh plan)
  exec2    — its noop write (the bench's steady-state per-iter cost)

The bench times build+exec per iteration, so (rebuild+exec2) ~= the
bench median; the build/exec split says whether to attack plan size or
execution.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homelogging_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("homelogging-profile")
    spark.sparkContext.setLogLevel("ERROR")

    from homelogging_spark.functions.cachelife import release_caches
    from homelogging_spark.tables import load_table

    load_table(spark, sf_dir, "events").count()
    load_table(spark, sf_dir, "lineitem").count()

    for n in names:
        fn = qs[n]
        spark.sparkContext.setJobDescription(f"profile:{n}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        release_caches()
        t3 = time.time()
        df2 = fn(spark, sf_dir)
        t4 = time.time()
        df2.write.format("noop").mode("overwrite").save()
        t5 = time.time()
        release_caches()
        print(
            f"{n}: build={t1-t0:.3f} exec1={t2-t1:.3f} "
            f"rebuild={t4-t3:.3f} exec2={t5-t4:.3f} "
            f"(bench-like iter={t4-t3+t5-t4:.3f})",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
