"""Like-for-like cold/warm adjudication for bench `vs_prev` flags.

When `bench.py`'s vs_prev flags a "regression" on a query whose code no
commit touched, the r4 lesson (SCALE.md "bench loop-order") says the
likely mechanism is loop POSITION: the first execution of a query in a
session pays plan compilation and first-touch costs. This tool
reproduces the r4 treatment: the same session-level warm-up bench.py
performs, then N consecutive runs per flagged query, so run 1 shows the
cold-first cost and runs 2..N the plan's real cost.

Usage: python tools/coldwarm.py query1 [query2 ...] [--runs=N | --runs N]
Prints one JSON line per query: {"query": ..., "runs": [sec, ...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    argv, args, n_runs = sys.argv[1:], [], 5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            # both documented forms: --runs=N and --runs N
            if "=" in a:
                n_runs = int(a.split("=", 1)[1])
            else:
                i += 1
                if i >= len(argv):
                    raise SystemExit("--runs needs a value: --runs=N | --runs N")
                n_runs = int(argv[i])
        else:
            args.append(a)
        i += 1
    if not args:
        raise SystemExit("usage: coldwarm.py query1 [query2 ...] [--runs=N | --runs N]")

    import __spark_entry__ as entry

    queries = entry.queries()
    unknown = [n for n in args if n not in queries]
    if unknown:
        import difflib

        hints = {
            n: difflib.get_close_matches(n, queries.keys(), n=3, cutoff=0.4)
            for n in unknown
        }
        raise SystemExit(
            f"unknown queries: {hints} — note r7 merged repetition_scores "
            "into quality_score (COVERAGE.md consolidations)"
        )

    from homelogging_spark.session import get_spark

    spark = get_spark("coldwarm")
    spark.sparkContext.setLogLevel("ERROR")

    # the same session-level warm-up bench.py performs (one cheap query
    # so JVM/codegen/parquet-footer caches are in their bench state)
    queries["time_range_filter"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    # same calibration probes bench.py records: a solo record is only
    # comparable to an in-suite record through their calibrations
    from homelogging_spark.functions.envprobe import calibration_probes

    print(json.dumps({"calibration": calibration_probes(spark)}))

    for name in args:
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        print(json.dumps({"query": name, "sf_dir": SF_DIR, "runs": runs}))


if __name__ == "__main__":
    main()
