#!/usr/bin/env python
"""Capture .explain('formatted') for declared queries into plans/r08/.

Usage: PLAN_TAG=before python tools_plan_capture.py [names...]
Defaults to the bench-relevant query subset. Iterative queries
(quality_score, bpe_train, dedup_clusters, dedup_semantic) execute their
training/label rounds during DataFrame construction; the captured plan is
the final returned frame's — per-round internals are documented in
OPTIMIZATION_r08.md instead.
"""

from __future__ import annotations

import os
import sys

DEFAULT = [
    "quality_score", "quality_feats", "dedup_semantic", "dedup_clusters",
    "dedup_substrings", "dedup_spans", "dedup_paragraphs", "dedup_winnow",
    "dedup_minhash", "text_dsir_weight", "text_lm_score", "text_freq_score",
    "text_gopher", "text_repetition", "text_rep_ngrams", "text_c4_clean",
    "url_canon", "decontaminate", "decontaminate_frac", "pack_sequences",
    "corpus_stats", "sim_topk", "sim_batch_topk", "agg_tpch_q1ish",
    "join_sortmerge", "agg_domain_lang_hour", "win_topk", "bpe_train",
]


def main() -> int:
    tag = os.environ.get("PLAN_TAG", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    os.makedirs("plans/r08", exist_ok=True)

    import __spark_entry__ as entry
    from bmspark.session import get_session

    spark = get_session("plans-r08")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for n in names:
        df = qs[n](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = f"plans/r08/{n}_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
