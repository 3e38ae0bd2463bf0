#!/usr/bin/env python
"""spark-submit entry point: incremental (cross-tick) dedup daemon.

Runs the standing exactly-once dedup job over a landing directory —
each invocation processes every file the state manifest has not seen,
as one tick, at the chosen granularity:

  --mode doc   exact document dedup (functions/text.fingerprint): each
               tick emits only docs whose content has NEVER been
               emitted before (plans/incremental_dedup.dedup_tick).
  --mode span  span-level dedup (the incremental twin of
               curation.dedup_spans): every --span-tokens-token span
               that any prior tick emitted is stripped, docs are
               rebuilt from surviving spans, emptied docs dropped
               (plans/incremental_dedup.span_dedup_tick).

``--compact-every K`` folds the fingerprint/span-hash state into one
clustered generation after every K committed ticks, bounding the
anti-join's path count for arbitrarily long-lived pipelines
(``--bucketed`` additionally registers the doc-mode generation as a
BUCKETED-BY-fp catalog table: the per-tick anti-join then reads the
state side with zero exchange and zero sort).

``--ticks N`` re-lists the source up to N times (a poor man's poll
loop for drivers without a scheduler); the default 1 processes
whatever is new and exits. Prints ONE JSON line with the run records.

Usage:
    spark-submit --py-files /tmp/bmspark.zip jobs/dedup_ticks.py \\
        --source /data/landing --out /data/deduped \\
        --mode span --span-tokens 10 --compact-every 50
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["doc", "span"], default="doc")
    ap.add_argument("--span-tokens", type=int, default=10)
    ap.add_argument("--ticks", type=int, default=1,
                    help="re-list the source up to N times this run")
    ap.add_argument("--compact-every", type=int, default=None, metavar="K",
                    help="fold state into one generation after every K "
                         "committed ticks")
    ap.add_argument("--bucketed", action="store_true",
                    help="doc mode: write compacted state as a "
                         "BUCKETED-BY-fp catalog table (exchange-free "
                         "anti-join)")
    ap.add_argument("--n-files", type=int, default=8,
                    help="files/buckets per compacted state generation")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from bmspark.plans import incremental_dedup as idp
    from bmspark.session import get_session

    spark = get_session("bmspark-dedup-ticks", master=args.master)
    runs, compactions = [], []
    for _ in range(args.ticks):
        if args.mode == "doc":
            run = idp.dedup_tick(spark, args.source, args.out)
        else:
            run = idp.span_dedup_tick(
                spark, args.source, args.out, span_tokens=args.span_tokens
            )
        if run is None:
            break
        runs.append(run)
        if args.compact_every and (run["tick"] + 1) % args.compact_every == 0:
            if args.mode == "doc":
                rec = idp.compact_ticks(
                    spark, args.out, n_files=args.n_files,
                    bucketed=args.bucketed,
                )
            else:
                rec = idp.compact_span_state(
                    spark, args.out, n_files=args.n_files
                )
            if rec is not None:
                compactions.append(rec)
    print(json.dumps({
        "mode": args.mode,
        "runs": runs,
        "compactions": compactions,
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
