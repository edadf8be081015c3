#!/usr/bin/env python
"""Training-data curation + shuffled export for ``ray job submit``.

    ray job submit --working-dir . -- \
        python tools/curate_export.py --sf-dir /data/sf --out /data/curated \
        [--quality-min 0.70] [--held-hex 0147] [--k 3] [--seed 0] \
        [--num-shards 16]

Runs :func:`themis_search_engine_ray.pipelines.curate.curate_corpus`
(exact dedup keep-min → held-out exclusion → n-gram decontamination →
quality floor → deterministic shuffle key) and writes the surviving
(doc_id, shuffle_key) manifest plus a prefix-range-sharded shuffled
export of the curated documents. Both outputs resume: the export skips
complete shards (parameter manifest pinned), the curation manifest is
written atomically.

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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True, help="dir holding documents.parquet")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--quality-min", type=float, default=0.70)
    ap.add_argument("--held-hex", default="0147", help="held-out split md5 prefix cut")
    ap.add_argument("--k", type=int, default=3, help="decontamination k-gram size")
    ap.add_argument("--seed", type=int, default=0, help="shuffle seed")
    ap.add_argument("--num-shards", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from themis_search_engine_ray.pipelines.curate import curate_corpus
    from themis_search_engine_ray.pipelines.shuffle import shuffle_export

    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)

    kept = curate_corpus(
        args.sf_dir,
        quality_min=args.quality_min,
        held_hex=args.held_hex,
        k=args.k,
        seed=args.seed,
    ).to_pandas()
    t_curate = time.time() - t0

    # export FIRST: it validates the pinned (seed, num_shards, keep
    # digest) and refuses a parameter-changed resume BEFORE anything is
    # replaced — so curated_manifest.parquet is only (re)written once
    # the shards it describes are consistent with it
    t0 = time.time()
    export = shuffle_export(
        args.sf_dir,
        os.path.join(args.out, "shards"),
        seed=args.seed,
        num_shards=args.num_shards,
        keep_ids=kept["doc_id"].to_numpy(),  # export ONLY the curated set
    )
    t_export = time.time() - t0

    manifest_path = os.path.join(args.out, "curated_manifest.parquet")
    kept.sort_values("shuffle_key").reset_index(drop=True).to_parquet(
        manifest_path + ".tmp"
    )
    os.replace(manifest_path + ".tmp", manifest_path)

    summary = {
        "curated_docs": int(len(kept)),
        "curate_sec": round(t_curate, 3),
        "export": export,
        "export_sec": round(t_export, 3),
        "params": vars(args),
    }
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
