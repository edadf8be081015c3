#!/usr/bin/env python
"""Batch IR evaluation entrypoint (the reference's ``Search.main`` eval
flow: judgments → ranked retrieval → AP/nDCG → min/max/avg report).

    python tools/evaluate.py --index idx/ --judgments queries.jsonl \
        --model bm25 -k 50 --report out/report.txt

Judgments: JSON-lines {qid, query, frequency, documents:[{doc_id,
relevance}]} with doc_id = "conv_id:turn_idx" (FIXTURES.md §2).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--judgments", required=True)
    ap.add_argument("--model", choices=["bm25", "vsm", "existential", "phrase"], default="bm25")
    ap.add_argument("-k", type=int, default=50)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--report", default=None, help="also write a text report here")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    from themis_search_engine_ray.pipelines.evaluation import (
        evaluate,
        read_judgments,
        write_eval_report,
    )

    judged = read_judgments(args.judgments)
    res = evaluate(
        args.index, judged, model=args.model, k=args.k, concurrency=args.concurrency
    )
    if args.report:
        write_eval_report(args.report, res)

    def denan(x):
        # the metrics keep the reference's NaN semantics; JSON gets null
        import math

        if isinstance(x, float) and math.isnan(x):
            return None
        if isinstance(x, dict):
            return {k: denan(v) for k, v in x.items()}
        if isinstance(x, list):
            return [denan(v) for v in x]
        return x

    print(
        json.dumps(
            denan(
                {
                    "model": res["model"],
                    "k": res["k"],
                    "queries": len(res["per_query"]),
                    "ap": vars(res["ap"]),
                    "ndcg": vars(res["ndcg"]),
                    "per_query": res["per_query"],
                }
            )
        )
    )


if __name__ == "__main__":
    main()
