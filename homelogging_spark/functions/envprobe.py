"""Environment calibration probes for the bench surfaces.

The r6 bench adjudication showed this box's throughput is NOT a stable
fact: the same commit re-measured hours apart moved 1.5-4x on pure-JVM
plans with no code change (SCALE.md "r6 environmental adjudication";
the judge's same-day re-runs disagreed with the committed solo numbers
by 3-4x). A per-run calibration converts "it was the environment" from
a claim into a measurement: every bench.py and coldwarm.py run times
the SAME three fixed, data-independent workloads and records the
results next to the query timings. Comparing two records now starts by
comparing their calibrations — if the probes moved 2x, the queries
moving 2x is the box, not the code.

Probes (medians of ``n_iters`` runs each):

- ``jvm_cpu_sec``: whole-stage-codegen arithmetic over ``range`` — the
  pure-JVM compute floor (no I/O, no Python, no shuffle).
- ``jvm_str_sec``: md5 + regexp over synthesized strings — the
  string/regex engine the text queries lean on.
- ``arrow_py_sec``: an Arrow-batched pandas identity UDF round trip —
  the python-worker tax the codec queries pay.
"""

from __future__ import annotations

import time


def calibration_probes(spark, n_iters: int = 3) -> dict[str, float]:
    """Time the three fixed probes; return {probe: median_sec}."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def ident(s):
        return s

    ident.__annotations__ = {"s": pd.Series, "return": pd.Series}
    arrow_udf = pandas_udf(ident, "long")
    par = int(spark.sparkContext.defaultParallelism)

    def jvm_cpu():
        spark.range(0, 50_000_000).selectExpr(
            "sum(id * 2 + 1) as s"
        ).write.format("noop").mode("overwrite").save()

    def jvm_str():
        spark.range(0, 300_000).selectExpr(
            "sum(length(regexp_replace(md5(cast(id as string)), '[0-9]', ''))) as s"
        ).write.format("noop").mode("overwrite").save()

    def arrow_py():
        spark.range(0, 1_000_000).repartition(par).select(
            arrow_udf(F.col("id"))
        ).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name, fn in (
        ("jvm_cpu_sec", jvm_cpu),
        ("jvm_str_sec", jvm_str),
        ("arrow_py_sec", arrow_py),
    ):
        runs = []
        for _ in range(n_iters):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        runs.sort()
        out[name] = round(runs[len(runs) // 2], 3)
    return out
