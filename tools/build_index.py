#!/usr/bin/env python
"""Index-build entrypoint for ``ray job submit`` (north_rule).

    ray job submit --working-dir . -- \
        python tools/build_index.py --input /data/turns --out /data/index \
        --partitions 64 --salt-bits 4 --term-parts 32 [--norms]

Resumable: partitions whose manifest matches the config fingerprint and
input list are skipped, so re-submitting after a failure completes only
the missing shards (per-partition lineage + metrics in manifest/*.json).

In this sandbox the same entrypoint runs standalone (Ray auto-inits or
honors RAY_ADDRESS=local); on a real cluster ``ray job submit`` provides
the session — hence the is_initialized() guard.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet file/dir of transcript turns")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--partitions", type=int, default=4, help="checkpoint partitions")
    ap.add_argument("--salt-bits", type=int, default=3, help="log2 doc-range shards")
    ap.add_argument("--term-parts", type=int, default=8, help="term-hash parts per shard")
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument(
        "--doc-id-mode",
        choices=["hash", "dense"],
        default="hash",
        help="dense = counting pre-pass + per-salt dense ranks (smaller index)",
    )
    ap.add_argument("--norms", action="store_true", help="also build VSM doc norms")
    ap.add_argument(
        "--compact",
        action="store_true",
        help="merge per-partition posting runs into one segment per gkey",
    )
    ap.add_argument(
        "--append",
        action="store_true",
        help="incrementally add --input to an existing --out index",
    )
    ap.add_argument("--num-cpus", type=int, default=None, help="standalone-mode cpus")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    from themis_search_engine_ray.pipelines.index_build import (
        BuildConfig,
        append_to_index,
        build_index,
        build_norms,
        compact_index,
    )

    cfg = BuildConfig(
        salt_bits=args.salt_bits,
        term_parts=args.term_parts,
        num_partitions=args.partitions,
        batch_size=args.batch_size,
        with_positions=not args.no_positions,
        doc_id_mode=args.doc_id_mode,
    )
    t0 = time.time()
    if args.append:
        meta = append_to_index(args.out, args.input, cfg)
    else:
        meta = build_index(args.input, args.out, cfg)
    if args.norms:
        build_norms(args.out)
    if args.compact:
        compact_index(args.out)
    meta["wall_seconds"] = round(time.time() - t0, 3)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
