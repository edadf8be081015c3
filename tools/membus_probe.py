"""Ray-free memory-bus scaling probe.

Runs the index build's exact per-doc analyze kernel (normalize →
tokenize → stopword filter → Porter stem → tf accumulation, i.e.
FragmentBatcher's CPU core) over identical synthetic text with plain
``multiprocessing`` — no Ray, no object store, no shuffle — at several
process counts, and reports per-process throughput at each point.

Purpose: separate "this engine scales badly 8→32 workers" from "this
single box scales badly 8→32 processes". If per-process throughput
drops the same way under bare multiprocessing as it does inside the
Ray build, the residual 8→32 inefficiency is the shared memory bus /
LLC of the one sandbox node, not the engine (a real 4×-node cluster
adds memory buses with its CPUs). Results recorded in BASELINE.md.

Usage: python tools/membus_probe.py [--procs 2,8,32] [--docs-per-proc 20000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(args):
    wid, n_docs = args
    # import inside the worker: each process pays its own import, like a
    # Ray worker would; excluded from the timed region below
    import pyarrow as pa

    from themis_search_engine_ray.stages.tokenize import FragmentBatcher
    from themis_search_engine_ray.sources.transcripts import generate_block

    batches: list[pa.Table] = []
    got, bid = 0, wid * 1000
    while got < n_docs:
        tab = generate_block(bid, min(2048, n_docs - got), seed=42)
        batches.append(tab)
        got += tab.num_rows
        bid += 1

    batcher = FragmentBatcher(
        salt_bits=3, term_parts=8, with_positions=True, emit_doc_stats=True
    )
    batcher(batches[0])  # warm stem cache / code paths (untimed)

    t0 = time.perf_counter()
    rows = 0
    for b in batches:
        rows += batcher(b).num_rows
    dt = time.perf_counter() - t0
    return {"wid": wid, "docs": got, "sec": dt, "frag_rows": rows}


def run_point(n_procs: int, docs_per_proc: int) -> dict:
    ctx = mp.get_context("spawn")  # fresh interpreters, like Ray workers
    with ctx.Pool(n_procs) as pool:
        # barrier-start: hand every worker its full share at once
        t0 = time.perf_counter()
        res = pool.map(_worker, [(i, docs_per_proc) for i in range(n_procs)])
        wall = time.perf_counter() - t0
    total_docs = sum(r["docs"] for r in res)
    in_worker = max(r["sec"] for r in res)
    return {
        "procs": n_procs,
        "docs": total_docs,
        "worker_max_sec": round(in_worker, 3),
        "docs_per_sec": round(total_docs / in_worker, 1),
        "docs_per_sec_per_proc": round(total_docs / in_worker / n_procs, 1),
        "pool_wall_sec": round(wall, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="2,8,32")
    ap.add_argument("--docs-per-proc", type=int, default=20000)
    args = ap.parse_args()
    points = [run_point(int(p), args.docs_per_proc) for p in args.procs.split(",")]
    out = {"metric": "analyze-kernel multiprocessing scaling (no Ray)", "points": points}
    effs = {}
    for lo, hi in zip(points, points[1:]):
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (hi["procs"] / lo["procs"])
        effs[f"{lo['procs']}->{hi['procs']}"] = round(eff, 3)
    out["scaling_efficiency"] = effs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
