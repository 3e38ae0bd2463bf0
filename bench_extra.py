#!/usr/bin/env python
"""Round-8 measurement harness (guide §1.1/§1.4): per-operator timing with
noop-sink isolation and session-conf A/B overrides.

``bench.py`` is FROZEN for driver measurement; this file exists so the
optimization round can (a) isolate single operators, (b) A/B engine-profile
confs in fresh JVMs, and (c) capture ``.explain("formatted")`` plans — none
of which may touch the frozen bench. Timed regions intentionally mirror
bench.py's methodology (same inputs, same reps=min-of-N, same noop sinks),
so numbers are comparable with BENCH/last_bench.json.

Usage:
  python bench_extra.py OP [OP ...] [--reps N] [--conf k=v ...] [--json PATH]
  python bench_extra.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra session conf k=v (needs fresh JVM per run)")
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

    from pyspark.sql import functions as F

    from bmspark.functions import curation, dedup, similarity, text
    from bmspark.functions import quality_model as qm
    from bmspark.operators import aggregate as agg_ops
    from bmspark.operators import windows
    from bmspark.session import get_session

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_session("bmspark-bench-extra", master=f"local[{cpus}]",
                        extra_confs=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    docs_ml = docs.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" value "), F.lit("\n\n")).alias("text"),
    )
    docs_lines = docs.select(
        "doc_id",
        F.replace(
            F.replace(F.col("text"), F.lit(" table "), F.lit(".\n")),
            F.lit(" row "), F.lit("\n"),
        ).alias("text"),
    )

    def bpe_run():
        from bmspark.functions import bpe
        rows = bpe.bpe_train(docs, n_merges=10).collect()
        assert len(rows) == 10

    OPS = {
        "agg_tpch_q1ish": lambda: agg_ops.tpch_q1ish(li).collect(),
        "join_sortmerge": lambda: li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect(),
        "dedup_minhash": lambda: dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", 0.5).collect(),
        "sim_topk": lambda: similarity.cosine_topk(
            emb, list(range(10)), k=10).collect(),
        "dedup_winnow": lambda: dedup.winnow_neardup_pairs(
            docs, "text", "doc_id", 3).collect(),
        "pack_sequences": lambda: noop(curation.pack_sequences(docs, 512, 8)),
        "text_repetition": lambda: noop(curation.repetition_metrics(docs)),
        "dedup_clusters": lambda: dedup.connected_components(
            dedup.winnow_neardup_pairs(docs, "text", "doc_id", 3)).collect(),
        "decontaminate": lambda: curation.contaminated_docs(
            docs.filter("doc_id % 17 <> 0"), docs.filter("doc_id % 17 = 0"),
            n=5, min_shared=1).collect(),
        "dedup_spans": lambda: noop(curation.dedup_spans(docs, 10)),
        "dedup_paragraphs": lambda: noop(curation.dedup_paragraphs(docs_ml)),
        "text_c4_clean": lambda: noop(curation.c4_clean(docs_lines)),
        "text_gopher": lambda: noop(curation.gopher_quality(docs)),
        "text_freq_score": lambda: noop(curation.freq_score(docs)),
        "dedup_substrings": lambda: noop(curation.dedup_substrings(docs, 10)),
        "dedup_substrings_hashed": lambda: noop(
            curation.dedup_substrings(docs, 10, hash_grams=True)),
        "text_dsir_weight": lambda: noop(curation.dsir_weight(
            docs, docs.filter("source IN ('src0', 'src1')"))),
        "bpe_train": bpe_run,
        "quality_score": lambda: noop(qm.quality_classifier(
            docs, "source IN ('src0', 'src1')", iters=6)),
        "dedup_semantic": lambda: noop(similarity.semantic_dedup(
            emb, threshold=0.9, n_tables=2)),
        "sim_batch_topk": lambda: noop(similarity.batch_topk(
            emb,
            emb.select((F.col("vec_id") + 100000).alias("query_id"),
                       "embedding"),
            k=5, dim=64, drop_self=False)),
    }

    if args.list:
        print("\n".join(sorted(OPS)))
        return 0

    timings: dict[str, float] = {}
    reps_log: dict[str, list[float]] = {}
    for op in args.ops:
        fn = OPS[op]
        spark.sparkContext.setJobDescription(f"bench_extra: {op}")
        runs = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        timings[op] = min(runs)
        reps_log[op] = runs

    payload = {"queries": timings, "reps": reps_log, "conf": extra,
               "sf": sf_dir, "cpus": cpus}
    print(json.dumps(payload))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
