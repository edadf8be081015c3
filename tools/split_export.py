#!/usr/bin/env python
"""Deterministic train/val/test export in shuffled order, for
``ray job submit``.

    ray job submit --working-dir . -- \
        python tools/split_export.py --sf-dir /data/sf --out /data/splits \
        [--fractions train=0.9,val=0.05,test=0.05] [--split-seed 0] \
        [--shuffle-seed 0] [--num-shards 16] [--only train]

Each split lands in ``<out>/<split>/`` as a prefix-range-sharded
shuffled export (:func:`themis_search_engine_ray.pipelines.shuffle
.shuffle_export`): reading a split's shards 0..N-1 in order yields that
split in its exact global shuffled order. Membership is the PURE-ROW
:func:`..pipelines.sampling.dataset_split` hash-range rule, filtered
inside the export's single streaming pass — no id list is ever
materialized (the train split of a 100 TB corpus IS the corpus), every
split export resumes independently (per-shard files + pinned parameter
manifest), and the three exports share one scan shape so they can run
concurrently or serially with identical results.

In this sandbox the entrypoint runs standalone (Ray auto-inits or
honors RAY_ADDRESS=local); on a real cluster ``ray job submit``
provides the session — hence the is_initialized() guard.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_fractions(spec: str) -> dict:
    out = {}
    for part in spec.split(","):
        name, _, frac = part.partition("=")
        if not name or not frac:
            raise SystemExit(f"bad --fractions component {part!r}")
        try:
            out[name.strip()] = float(frac)
        except ValueError:
            raise SystemExit(f"bad --fractions component {part!r}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True, help="dir holding documents.parquet")
    ap.add_argument("--out", required=True, help="output directory (one subdir per split)")
    ap.add_argument("--fractions", default="train=0.9,val=0.05,test=0.05")
    ap.add_argument("--split-seed", type=int, default=0)
    ap.add_argument("--shuffle-seed", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--only", default=None, help="export just this split")
    ap.add_argument(
        "--jsonl",
        choices=["plain", "gzip"],
        default=None,
        help="additionally convert each split's shards to JSONL "
        "(<out>/<split>-jsonl/, same shard order; gzip → .jsonl.gz)",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from themis_search_engine_ray.pipelines.sampling import split_boundaries
    from themis_search_engine_ray.pipelines.shuffle import shuffle_export

    fractions = parse_fractions(args.fractions)
    names = [n for n, _ in split_boundaries(fractions)]  # validates
    if args.only is not None:
        if args.only not in names:
            raise SystemExit(f"--only {args.only!r} not in {names}")
        names = [args.only]

    report = {"out": args.out, "splits": {}}
    for name in names:
        t0 = time.time()
        stats = shuffle_export(
            args.sf_dir,
            os.path.join(args.out, name),
            seed=args.shuffle_seed,
            num_shards=args.num_shards,
            split=(name, fractions, args.split_seed),
        )
        stats["sec"] = round(time.time() - t0, 3)
        if args.jsonl:
            from themis_search_engine_ray.pipelines.shuffle import export_jsonl

            stats["jsonl"] = export_jsonl(
                os.path.join(args.out, name),
                os.path.join(args.out, f"{name}-jsonl"),
                compression="gzip" if args.jsonl == "gzip" else None,
            )
        report["splits"][name] = stats
    print(json.dumps(report))


if __name__ == "__main__":
    main()
