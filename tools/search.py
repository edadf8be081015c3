#!/usr/bin/env python
"""Query-serving entrypoint (``ray job submit``-able, or standalone).

    python tools/search.py --index /data/index --model bm25 -k 10 \
        "vector hash aggregate" "scan filter query"

Spins up the shard-actor pool once, runs every query through it, prints
one JSON line per query with ranked (conv_id, turn_idx, score).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--model", choices=["bm25", "vsm", "existential"], default="bm25")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--no-prune", action="store_true", help="disable block-max pruning")
    ap.add_argument("--role", default=None, help="filter hits to this role (with_role builds)")
    ap.add_argument(
        "--snippets",
        action="store_true",
        help="include highlighted snippets (store_text builds)",
    )
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    from themis_search_engine_ray.state.searcher import SearchEngine, snippets

    eng = SearchEngine(args.index)
    try:
        for q in args.queries:
            if args.model == "bm25":
                hits = eng.search(q, k=args.k, prune=not args.no_prune, role=args.role)
            elif args.model == "vsm":
                hits = eng.search_vsm(q, k=args.k)
            else:
                hits = eng.search_existential(q, k=args.k)
            rows = [
                {"conv_id": h.conv_id, "turn_idx": h.turn_idx, "score": h.score}
                for h in hits
            ]
            if args.snippets and hits:
                snips = snippets(args.index, hits, q)
                for r in rows:
                    r["snippet"] = snips.get((r["conv_id"], r["turn_idx"]))
            print(json.dumps({"query": q, "model": args.model, "hits": rows}))
    finally:
        eng.close()


if __name__ == "__main__":
    main()
