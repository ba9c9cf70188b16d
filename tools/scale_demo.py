"""Scale-headroom demo: run headline queries against a synthetically
blown-up copy of the sf0.1 tables and compare observed scaling with the
cost models the operator docstrings claim.

Usage: python tools/scale_demo.py [factor]   (default 10)

The blow-up replicates each source row ``factor`` times with shifted
keys/timestamps (i-th copy offset by i days and a disjoint id range), so
group counts, join fan-ins, and LSH bucket populations all grow ~linearly
— a stand-in for "what does 10x more data do to the plan" on a single
box. Writes the blown-up tables once under spark-warehouse/ and reuses
them on re-runs. Prints one JSON line per query:
{"query": ..., "factor": N, "rows_in": ..., "sec": ...} plus a summary
comparing per-row throughput at 1x vs Nx.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from homelogging_spark.session import get_spark
from homelogging_spark.tables import _FIXTURE_ROOT, load_table

BASE_SF = "/root/testdata/sf0.1"


def blow_up_events(spark, factor: int) -> str:
    out = os.path.join(_FIXTURE_ROOT, f"scale_demo_x{factor}")
    if os.path.exists(os.path.join(out, "events.parquet", "_SUCCESS")):
        return out
    ev = load_table(spark, BASE_SF, "events")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    copies = spark.range(factor).withColumnRenamed("id", "copy")
    big = (
        ev.crossJoin(F.broadcast(copies))
        .select(
            (F.col("event_id") + F.col("copy") * 10_000_000).alias("event_id"),
            (F.col("ts") + F.make_interval(days=F.col("copy").cast("int"))).alias("ts"),
            (F.col("user_id") + F.col("copy") * n_users).alias("user_id"),
            "event_type",
            # per-copy jitter so aggregates don't fold to x1 values
            (F.col("value") + F.col("copy") * 0.001).alias("value"),
            "props",
        )
    )
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    docs = load_table(spark, BASE_SF, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    big_docs = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            # shift text content per copy so near-dup structure is
            # replicated, not collapsed into one giant duplicate class
            F.concat(F.col("text"), F.lit(" c"), F.col("copy").cast("string")).alias(
                "text"
            ),
            "lang",
            "source",
            "n_chars",
        )
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    # remaining tables: symlink-free copy-through reads from sf0.1
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-demo")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = blow_up_events(spark, factor)

    from homelogging_spark.operators.dedup import (
        incremental_dedup,
        minhash_near_dup_pairs,
    )
    from homelogging_spark.plans.flagship import hourly_cost_analysis
    from homelogging_spark.plans.llm_registry import q_corpus_build_pipeline

    results = []

    def timed(name, sf_dir, fn, rows_in):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        results.append(
            {"query": name, "dir": os.path.basename(sf_dir), "rows_in": rows_in, "sec": sec}
        )
        print(json.dumps(results[-1]))

    for sf_dir in (BASE_SF, big_dir):
        ev_path = os.path.join(sf_dir, "events.parquet")
        ev_rows = spark.read.parquet(ev_path).count()
        # flagship reads events via load_table(sf_dir)
        timed(
            "flagship_hourly_cost",
            sf_dir,
            lambda d=sf_dir: hourly_cost_analysis(spark, d),
            ev_rows,
        )
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        doc_rows = docs.count()
        timed(
            "minhash_near_dup",
            sf_dir,
            lambda dd=docs: minhash_near_dup_pairs(dd, threshold=0.7),
            doc_rows,
        )
        # snapshot-incremental dedup: 25% of docs play the new snapshot
        timed(
            "incremental_dedup",
            sf_dir,
            lambda dd=docs: incremental_dedup(
                dd.where(F.col("doc_id") % 4 == 0),
                dd.where(F.col("doc_id") % 4 != 0),
            ),
            doc_rows,
        )
        # the end-to-end corpus build (hygiene -> cluster keep-best ->
        # budget); needs documents.parquet in sf_dir layout, which both
        # dirs have
        timed(
            "corpus_build_pipeline",
            sf_dir,
            lambda d=sf_dir: q_corpus_build_pipeline(spark, d),
            doc_rows,
        )
        # exact duplicated-passage stats: stride-1 positional shingles,
        # one shuffle on the gram hash — the volume-heaviest text op
        from homelogging_spark.operators.chunking import (
            chunk_documents,
            duplicated_passages,
        )

        timed(
            "passage_dedup",
            sf_dir,
            lambda dd=docs: duplicated_passages(dd),
            doc_rows,
        )
        timed(
            "doc_chunks",
            sf_dir,
            lambda dd=docs: chunk_documents(dd),
            doc_rows,
        )

    by = {(r["query"], r["dir"]): r for r in results}
    summary = {}
    for q in (
        "flagship_hourly_cost",
        "minhash_near_dup",
        "incremental_dedup",
        "corpus_build_pipeline",
        "passage_dedup",
        "doc_chunks",
    ):
        a = by[(q, os.path.basename(BASE_SF))]
        b = by[(q, os.path.basename(big_dir))]
        summary[q] = {
            "rows_ratio": round(b["rows_in"] / a["rows_in"], 2),
            "time_ratio": round(b["sec"] / a["sec"], 2),
            "per_row_throughput_ratio": round(
                (b["rows_in"] / b["sec"]) / (a["rows_in"] / a["sec"]), 2
            ),
        }
    print(json.dumps({"factor": factor, "summary": summary}))


if __name__ == "__main__":
    main()
