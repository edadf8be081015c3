"""Bench harness (driver contract).

Headline pipelines over a deterministic synthetic transcript corpus
scaled off $GRAFT_SF_DIR's scale factor, plus the sf_dir data-pipeline
operators. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-component sec...}, "sf": <sf>, "num_cpus": N,
   "turns": n, "build_turns_per_sec": r, "query_p50_ms": ..., "query_p99_ms": ...}

Modes:
  python bench.py               one measured run (RAY_GRAFT_CPUS cpus)
  python bench.py --scaling     fresh subprocesses at 8 and 32 cpus on
                                the same input; prints both + efficiency
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(os.path.normpath(d))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.1


def _corpus_dir(n_turns: int, seed: int) -> str:
    # v2: small row groups so files split into many read tasks
    return f"/tmp/themis_bench_corpus_v2_{n_turns}_{seed}"


def run_bench(build_only: bool = False) -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    # sized so compute dominates the fixed per-pipeline overheads (4
    # partition pipelines x startup+shuffle barrier ~ 6s); at 120k turns
    # the build is overhead-bound and CPUs can't scale it
    n_turns = int(os.environ.get("RAY_GRAFT_TURNS", str(max(20_000, int(4_000_000 * sf)))))
    seed = 42

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from themis_search_engine_ray.pipelines.dedup import minhash_pairs_ds
    from themis_search_engine_ray.pipelines.index_build import (
        BuildConfig,
        build_index,
        compact_index,
    )
    from themis_search_engine_ray.sources.transcripts import (
        synthetic_dataset,
        write_synthetic,
    )
    from themis_search_engine_ray.state.searcher import SearchEngine

    timings: dict[str, float] = {}

    # corpus: generated once per (n_turns, seed), reused across runs; warm
    # the page cache with one untimed read so we measure compute + shuffle
    corpus = _corpus_dir(n_turns, seed)
    if not (os.path.isdir(corpus) and os.listdir(corpus)):
        tmp = corpus + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        write_synthetic(tmp, n_turns=n_turns, seed=seed, turns_per_block=8192)
        os.replace(tmp, corpus)
    import ray.data as rd

    rd.read_parquet(corpus).count()  # warm cache (untimed)

    # --- index build ---
    idx_dir = f"/tmp/themis_bench_idx_{os.getpid()}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    # batch_size 8192: bigger analyzer batches amortize per-batch
    # dictionary-encode overhead and emit fewer fragment rows (measured
    # ~15% faster than 2048 at 6.4M turns / 32 CPUs)
    cfg = BuildConfig(salt_bits=3, term_parts=8, num_partitions=4, batch_size=8192)
    t0 = time.time()
    meta = build_index(corpus, idx_dir, cfg)
    timings["index_build"] = time.time() - t0
    build_rate = n_turns / timings["index_build"]

    if build_only:
        result = {
            "metric": "index build only (scaling mode)",
            "value": round(timings["index_build"], 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": sf,
            "num_cpus": num_cpus,
            "turns": n_turns,
            "n_docs": meta["n_docs"],
            "n_postings": meta["n_postings"],
            "build_turns_per_sec": round(build_rate, 1),
        }
        shutil.rmtree(idx_dir, ignore_errors=True)
        ray.shutdown()
        return result

    # --- compaction (the default serving layout: one merged run per
    # term per gkey + precomputed global tie-break ordinal) ---
    t0 = time.time()
    compact_index(idx_dir)
    timings["compact"] = time.time() - t0

    # --- query serving latency ---
    from themis_search_engine_ray.sources.transcripts import _vocab

    vocab = [w for w in _vocab() if w.isascii() and w.isalpha()]
    queries = []
    for i in range(100):
        queries.append(" ".join(vocab[(i * 37 + j * 101) % len(vocab)] for j in range(3)))
    t0 = time.time()
    eng = SearchEngine(idx_dir)
    eng.search(queries[0], k=10)  # warm actor code paths (load-time, not latency)
    timings["engine_load"] = time.time() - t0
    lat = []
    t0 = time.time()
    for q in queries:
        tq = time.time()
        eng.search(q, k=10)
        lat.append(time.time() - tq)
    timings["queries_100"] = time.time() - t0
    eng.close()
    lat.sort()
    p50 = lat[len(lat) // 2] * 1000
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1000

    # --- batch query throughput (actor-pool QueryScorer over the index) ---
    import ray.data as _rd

    from themis_search_engine_ray.pipelines.evaluation import QueryScorer

    n_batch_q = 2000
    batch_qs = [
        {"qid": i, "query": " ".join(vocab[(i * 13 + j * 57) % len(vocab)] for j in range(3))}
        for i in range(n_batch_q)
    ]
    conc = min(16, max(2, num_cpus // 2))
    t0 = time.time()
    n_scored = (
        _rd.from_items(batch_qs, override_num_blocks=conc * 2)
        .map_batches(
            QueryScorer,
            fn_constructor_kwargs={"index_dir": idx_dir, "model": "bm25", "k": 10},
            concurrency=conc,
            batch_size=max(1, n_batch_q // (conc * 2)),
        )
        .count()
    )
    timings["batch_queries_2000"] = time.time() - t0
    batch_qps = n_scored / timings["batch_queries_2000"]

    # --- scaled dedup (MinHash LSH with distributed join verify) ---
    def as_docs(n_target: int):
        import pyarrow as pa

        from themis_search_engine_ray.stages.tokenize import doc_keys_batch

        # hash-deterministic sample (doc_id mod threshold): the same
        # ~n_target docs regardless of read/block order, so the
        # minhash_pairs count is comparable across rounds (a limit()
        # sample drifts with read order)
        rate = min(1.0, n_target / max(1, n_turns))
        cut = int(rate * (1 << 16))

        def to_doc(batch: pa.Table) -> pa.Table:
            import numpy as np

            ids = doc_keys_batch(
                batch["conv_id"].to_pylist(), batch["turn_idx"].to_pylist()
            ).astype(np.int64)
            keep = (ids & 0xFFFF) < cut
            return pa.Table.from_arrays(
                [pa.array(ids[keep]), batch["text"].filter(pa.array(keep))],
                names=["doc_id", "text"],
            )

        return (
            rd.read_parquet(corpus, columns=["conv_id", "turn_idx", "text"])
            .map_batches(to_doc, batch_format="pyarrow", zero_copy_batch=True)
        )

    t0 = time.time()
    # materialize: minhash_pairs_ds executes its input more than once.
    # repartition: spread the sample so every core gets signature work.
    docs_sample = (
        as_docs(min(n_turns, 30_000)).repartition(num_cpus * 2).materialize()
    )
    n_pairs = minhash_pairs_ds(docs_sample, verify="scan").count()
    timings["minhash_dedup_30k"] = time.time() - t0

    # --- term_df groupby at full corpus scale (the non-index shuffle op) ---
    from ray.data.aggregate import Sum

    from themis_search_engine_ray.stages.tokenize import FragmentBatcher

    t0 = time.time()
    frag = rd.read_parquet(corpus, columns=["conv_id", "turn_idx", "text"]).map_batches(
        FragmentBatcher(term_parts=8, with_positions=False),
        batch_format="pyarrow",
        batch_size=2048,
        zero_copy_batch=True,
    )
    import pyarrow as pa

    def df_rows(batch: pa.Table) -> pa.Table:
        import numpy as np

        ndocs = [len(v) // 8 for v in batch["docs"].to_pylist()]
        return pa.Table.from_arrays(
            [batch["term"], pa.array(np.asarray(ndocs, np.int64))], names=["term", "df"]
        )

    n_terms = (
        frag.map_batches(df_rows, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .count()
    )
    timings["term_df_full"] = time.time() - t0

    total = sum(timings.values())
    result = {
        "metric": "themis-ray headline: index build + BM25 serving + dedup + term_df",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "num_cpus": num_cpus,
        "turns": n_turns,
        "n_docs": meta["n_docs"],
        "n_postings": meta["n_postings"],
        "build_turns_per_sec": round(build_rate, 1),
        "query_p50_ms": round(p50, 2),
        "query_p99_ms": round(p99, 2),
        "batch_queries_per_sec": round(batch_qps, 1),
        "minhash_pairs": int(n_pairs),
        "distinct_terms": int(n_terms),
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Headline-pipeline (index build) at 8 vs 32 CPUs, fresh processes,
    same input — the sandbox stand-in for N- vs 4N-node clusters.

    The corpus is sized (default 6.4M turns, RAY_GRAFT_SCALING_TURNS to
    override) so per-partition compute dominates the fixed per-build
    latencies (measured ~1.7 s: task submission + finalize) that no CPU
    count can shrink; at bench-size corpora those overheads are the
    whole wall time and "scaling" would measure scheduler latency, not
    throughput. This is the regime a 100 TB job on a real cluster runs
    in permanently.
    """
    turns = int(os.environ.get("RAY_GRAFT_SCALING_TURNS", str(6_400_000)))
    cpu_points = [
        int(c)
        for c in os.environ.get("RAY_GRAFT_SCALING_CPUS", "8,32").split(",")
    ]
    repeats = int(os.environ.get("RAY_GRAFT_SCALING_REPEATS", "4"))

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), RAY_GRAFT_TURNS=str(turns)
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--build-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # this sandbox shares hardware — ambient load swings wall time 2-3x
    # between minutes. Interleave the CPU points and take each point's
    # BEST of `repeats` runs (raw runs all reported below), so both
    # points are judged under comparable machine conditions.
    runs: dict[int, list[float]] = {c: [] for c in cpu_points}
    for _ in range(repeats):
        for c in cpu_points:
            runs[c].append(run(c)["value"])
    best = {c: min(v) for c, v in runs.items()}
    pairs = {}
    for lo, hi in zip(cpu_points, cpu_points[1:]):
        eff = (best[lo] / best[hi]) / (hi / lo)
        pairs[f"{lo}->{hi}"] = round(eff, 3)
    return {
        "metric": "index-build scaling at N vs 4N cpus (sandbox stand-in for N->4N nodes)",
        "turns": turns,
        "points": {
            str(c): {
                "sec": round(best[c], 3),
                "build_turns_per_sec": round(turns / best[c], 1),
                "runs_sec": [round(v, 3) for v in runs[c]],
            }
            for c in cpu_points
        },
        "scaling_efficiency": pairs,
        "note": (
            "fresh subprocess per run; per-point best of "
            f"{repeats} interleaved repeats (shared-hardware sandbox — "
            "ambient load varies; raw runs in points.*.runs_sec). "
            "On one node all workers share a memory bus/object "
            "store/driver; a real N->4N-node cluster adds those "
            "resources with its CPUs. See BASELINE.md."
        ),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--build-only" in sys.argv:
        print(json.dumps(run_bench(build_only=True)))
    else:
        print(json.dumps(run_bench()))
