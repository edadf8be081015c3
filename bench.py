"""Bench harness (driver contract).

Headline pipelines over a deterministic synthetic transcript corpus
scaled off $GRAFT_SF_DIR's scale factor, plus the sf_dir data-pipeline
operators. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-component sec...}, "sf": <sf>, "num_cpus": N,
   "turns": n, "build_turns_per_sec": r, "query_p50_ms": ..., "query_p99_ms": ...}

Measurement protocol: this sandbox shares hardware and identical runs
swing 2-3x minute to minute (BASELINE.md records 23.6 s vs 75.7 s for
the same build). The default mode therefore runs the WHOLE component
suite ``RAY_GRAFT_BENCH_REPEATS`` (default 3) times back to back and
reports each component's BEST, with the raw per-repeat values in
"spread" — the same best-of-N-interleaved protocol ``--scaling``
already uses. The headline "value" is the sum of per-component bests.

Modes:
  python bench.py               best-of-N suite (RAY_GRAFT_CPUS cpus)
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


def _docs_fixture_dir(n_turns: int, seed: int) -> str:
    # v1 = fixture derivation version: bump when the sampling rule /
    # doc-key code changes so a stale cached fixture never feeds a
    # timed run (ONE definition — run_suite and the clean_text extra
    # must agree on the path)
    return f"/tmp/themis_bench_docs_v1_{n_turns}_{seed}"


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

    # batch_size 8192: bigger analyzer batches amortize per-batch
    # dictionary-encode overhead and emit fewer fragment rows (measured
    # ~15% faster than 2048 at 6.4M turns / 32 CPUs)
    cfg = BuildConfig(salt_bits=3, term_parts=8, num_partitions=4, batch_size=8192)

    if build_only:
        idx_dir = f"/tmp/themis_bench_idx_{os.getpid()}"
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        meta = build_index(corpus, idx_dir, cfg)
        dt = time.time() - t0
        result = {
            "metric": "index build only (scaling mode)",
            "value": round(dt, 3),
            "unit": "sec",
            "queries": {"index_build": round(dt, 3)},
            "sf": sf,
            "num_cpus": num_cpus,
            "turns": n_turns,
            "n_docs": meta["n_docs"],
            "n_postings": meta["n_postings"],
            "build_turns_per_sec": round(n_turns / dt, 1),
        }
        shutil.rmtree(idx_dir, ignore_errors=True)
        ray.shutdown()
        return result

    from themis_search_engine_ray.sources.transcripts import _vocab

    vocab = [w for w in _vocab() if w.isascii() and w.isalpha()]

    def run_suite() -> tuple[dict, dict]:
        """One full pass over every headline component; fresh index dir."""
        timings: dict[str, float] = {}
        extras: dict = {}
        idx_dir = f"/tmp/themis_bench_idx_{os.getpid()}"
        shutil.rmtree(idx_dir, ignore_errors=True)

        # --- index build ---
        t0 = time.time()
        meta = build_index(corpus, idx_dir, cfg)
        timings["index_build"] = time.time() - t0
        extras["n_docs"] = meta["n_docs"]
        extras["n_postings"] = meta["n_postings"]

        # --- compaction (the default serving layout: one merged run per
        # term per gkey + precomputed global tie-break ordinal) ---
        t0 = time.time()
        compact_index(idx_dir)
        timings["compact"] = time.time() - t0

        # --- query serving latency ---
        queries = [
            " ".join(vocab[(i * 37 + j * 101) % len(vocab)] for j in range(3))
            for i in range(100)
        ]
        t0 = time.time()
        eng = SearchEngine(idx_dir)
        eng.search(queries[0], k=10)  # warm actor code paths (load-time)
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
        extras["p50"] = lat[len(lat) // 2] * 1000
        extras["p99"] = lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1000

        # --- batch query throughput (actor-pool QueryScorer) ---
        from themis_search_engine_ray.pipelines.evaluation import QueryScorer

        n_batch_q = 2000
        batch_qs = [
            {
                "qid": i,
                "query": " ".join(
                    vocab[(i * 13 + j * 57) % len(vocab)] for j in range(3)
                ),
            }
            for i in range(n_batch_q)
        ]
        conc = min(16, max(2, num_cpus // 2))
        t0 = time.time()
        n_scored = (
            rd.from_items(batch_qs, override_num_blocks=conc * 2)
            .map_batches(
                QueryScorer,
                fn_constructor_kwargs={
                    "index_dir": idx_dir,
                    "model": "bm25",
                    "k": 10,
                },
                concurrency=conc,
                batch_size=max(1, n_batch_q // (conc * 2)),
            )
            .count()
        )
        timings["batch_queries_2000"] = time.time() - t0
        extras["batch_scored"] = n_scored

        # --- scaled dedup (MinHash LSH, hash-deterministic ~30k sample) ---
        def as_docs(n_target: int):
            import pyarrow as pa

            from themis_search_engine_ray.stages.tokenize import doc_keys_batch

            # doc_id-mod sample: the same docs regardless of read/block
            # order, so minhash_pairs counts are comparable across runs
            rate = min(1.0, n_target / max(1, n_turns))
            cut = int(rate * (1 << 16))

            def to_doc(batch: pa.Table) -> pa.Table:
                import numpy as np

                ids = doc_keys_batch(
                    batch["conv_id"], batch["turn_idx"]
                ).astype(np.int64)
                keep = (ids & 0xFFFF) < cut
                return pa.Table.from_arrays(
                    [pa.array(ids[keep]), batch["text"].filter(pa.array(keep))],
                    names=["doc_id", "text"],
                )

            return rd.read_parquet(
                corpus, columns=["conv_id", "turn_idx", "text"]
            ).map_batches(to_doc, batch_format="pyarrow", zero_copy_batch=True)

        # Sample derivation (full-corpus scan + repartition + materialize)
        # is bench scaffolding, timed separately so minhash_dedup_30k
        # measures the dedup OPERATOR. (Rounds 1-2 folded prep into the
        # dedup number — noted in BASELINE.md for cross-round reads.)
        # materialize: minhash_pairs_ds executes its input more than once.
        # repartition: spread the sample so every core gets signature work.
        t0 = time.time()
        docs_sample = (
            as_docs(min(n_turns, 30_000)).repartition(num_cpus * 2).materialize()
        )
        timings["minhash_sample_prep"] = time.time() - t0
        t0 = time.time()
        extras["minhash_pairs"] = int(
            minhash_pairs_ds(docs_sample, verify="scan").count()
        )
        timings["minhash_dedup_30k"] = time.time() - t0

        # --- curation composition + shuffled export (the curate_export
        # CLI path: one tag pass + keep-min groupby + decontamination +
        # prefix-shard shuffled export) over the same 30k-doc sample ---
        import pyarrow as pa
        import pyarrow.compute as pc

        docs_dir = _docs_fixture_dir(n_turns, seed)
        docs_file = f"{docs_dir}/documents.parquet"
        if not os.path.isfile(docs_file):
            # bench scaffolding, cached per corpus: curate's encoded
            # min-key needs ids < 2^62, so the 63-bit doc keys drop one
            # bit (30k ids in a 2^62 space — collision-free in practice)
            def half_id(batch: pa.Table) -> pa.Table:
                import numpy as np

                return pa.Table.from_arrays(
                    [pa.array(batch["doc_id"].to_numpy() >> 1), batch["text"]],
                    names=["doc_id", "text"],
                )

            tab = pa.concat_tables(
                docs_sample.map_batches(
                    half_id, batch_format="pyarrow"
                ).iter_batches(batch_size=8192, batch_format="pyarrow")
            )
            tab = tab.take(pc.sort_indices(tab["doc_id"]))
            os.makedirs(docs_dir, exist_ok=True)
            import pyarrow.parquet as pq_

            pq_.write_table(tab, docs_file + ".tmp")
            os.replace(docs_file + ".tmp", docs_file)

        from themis_search_engine_ray.pipelines.curate import curate_corpus
        from themis_search_engine_ray.pipelines.shuffle import shuffle_export

        exp_dir = f"/tmp/themis_bench_curate_{os.getpid()}"
        shutil.rmtree(exp_dir, ignore_errors=True)
        t0 = time.time()
        kept = curate_corpus(docs_dir).to_pandas()
        stats = shuffle_export(
            docs_dir, exp_dir, keep_ids=kept["doc_id"].to_numpy()
        )
        timings["curate_export_30k"] = time.time() - t0
        extras["curated_rows"] = stats["rows"]
        shutil.rmtree(exp_dir, ignore_errors=True)

        # --- term_df groupby at full corpus scale (non-index shuffle) ---
        from ray.data.aggregate import Sum

        from themis_search_engine_ray.stages.tokenize import FragmentBatcher

        t0 = time.time()
        frag = rd.read_parquet(
            corpus, columns=["conv_id", "turn_idx", "text"]
        ).map_batches(
            FragmentBatcher(term_parts=8, with_positions=False),
            batch_format="pyarrow",
            batch_size=2048,
            zero_copy_batch=True,
        )

        def df_rows(batch: pa.Table) -> pa.Table:
            # df contribution per fragment row = docs-blob bytes / 8
            df = pc.divide(pc.binary_length(batch["docs"]), 8)
            return pa.Table.from_arrays(
                [batch["term"], pc.cast(df, pa.int64())], names=["term", "df"]
            )

        extras["distinct_terms"] = int(
            frag.map_batches(df_rows, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"))
            .count()
        )
        timings["term_df_full"] = time.time() - t0

        shutil.rmtree(idx_dir, ignore_errors=True)
        return timings, extras

    # best-of-N protocol (see module docstring): ambient load on this
    # shared host swings single-shot numbers 2-3x; per-component bests
    # across back-to-back suite repeats measure the code, not the host
    repeats = max(1, int(os.environ.get("RAY_GRAFT_BENCH_REPEATS", "3")))
    runs: list[dict] = []
    extras_runs: list[dict] = []
    for _ in range(repeats):
        t, e = run_suite()
        runs.append(t)
        extras_runs.append(e)
    best = {k: min(r[k] for r in runs) for k in runs[0]}
    ex0 = extras_runs[0]

    # non-headline extra: clean_text throughput over the 30k-doc
    # fixture run_suite cached — reported as its own rate, NOT summed
    # into the headline (keeps cross-round headline comparability)
    from themis_search_engine_ray.pipelines.text_analysis import clean_text

    docs_dir = _docs_fixture_dir(n_turns, seed)
    t0 = time.time()
    n_clean = clean_text(docs_dir).count()
    clean_sec = time.time() - t0

    # non-headline extra: the Bloom decontamination scale path over the
    # same fixture (bitmap build + probe + distributed exact match)
    from themis_search_engine_ray.pipelines.decontaminate import decontaminate

    t0 = time.time()
    n_decon = decontaminate(docs_dir, mode="bloom").count()
    decon_sec = time.time() - t0

    # non-headline extras: PII redaction + sliding-window chunking over
    # the same fixture (both single-pass vectorized, no shuffle)
    from themis_search_engine_ray.pipelines.text_analysis import (
        chunk_documents,
        pii_redact,
    )

    t0 = time.time()
    n_pii = pii_redact(docs_dir).count()
    pii_sec = time.time() - t0
    t0 = time.time()
    n_chunks = chunk_documents(docs_dir).count()
    chunk_sec = time.time() - t0

    # non-headline extra: duplicate-span removal over the same fixture
    # (one counting shuffle + one broadcast-probe mask pass)
    from themis_search_engine_ray.pipelines.spans import span_dedup

    t0 = time.time()
    n_span = span_dedup(docs_dir).count()
    span_sec = time.time() - t0

    # non-headline extra: conversation reassembly (one bucketed groupby
    # + whole-bucket vectorized stitch — the group-co-location pattern)
    from themis_search_engine_ray.pipelines.conversations import (
        conversation_assemble,
    )

    t0 = time.time()
    n_convs = conversation_assemble(docs_dir).count()
    conv_sec = time.time() - t0

    # non-headline extras: the corpus-analysis family over the same
    # fixture — bigram PMI collocations (one counting groupby +
    # broadcast unigram scoring) and per-doc tf-idf keywords (one df
    # shuffle + broadcast idf + per-batch lexsort top-k)
    from themis_search_engine_ray.pipelines.text_analysis import (
        collocations_pmi,
        tfidf_keywords,
    )

    t0 = time.time()
    n_colloc = collocations_pmi(docs_dir).count()
    colloc_sec = time.time() - t0
    t0 = time.time()
    n_tfidf = tfidf_keywords(docs_dir).count()
    tfidf_sec = time.time() - t0

    # optional large-corpus build point: driver-visible throughput floor
    # at ~8x the headline corpus (BASELINE.md records the same regime)
    big = {}
    big_turns = int(os.environ.get("RAY_GRAFT_BENCH_BIG_TURNS", "0") or 0)
    if big_turns == 0 and n_turns >= 400_000:
        big_turns = 8 * n_turns
    if big_turns > n_turns:
        big_corpus = _corpus_dir(big_turns, seed)
        if not (os.path.isdir(big_corpus) and os.listdir(big_corpus)):
            tmp = big_corpus + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            write_synthetic(
                tmp, n_turns=big_turns, seed=seed, turns_per_block=8192
            )
            os.replace(tmp, big_corpus)
        rd.read_parquet(big_corpus).count()  # warm (untimed)
        bdir = f"/tmp/themis_bench_bigidx_{os.getpid()}"
        shutil.rmtree(bdir, ignore_errors=True)
        t0 = time.time()
        build_index(big_corpus, bdir, cfg)
        bsec = time.time() - t0
        shutil.rmtree(bdir, ignore_errors=True)
        big = {
            "big_turns": big_turns,
            "big_build_sec": round(bsec, 3),
            "big_build_turns_per_sec": round(big_turns / bsec, 1),
        }

    result = {
        "metric": "themis-ray headline: index build + BM25 serving + dedup + term_df",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in best.items()},
        "sf": sf,
        "num_cpus": num_cpus,
        "turns": n_turns,
        "n_docs": ex0["n_docs"],
        "n_postings": ex0["n_postings"],
        "build_turns_per_sec": round(n_turns / best["index_build"], 1),
        "query_p50_ms": round(min(e["p50"] for e in extras_runs), 2),
        "query_p99_ms": round(min(e["p99"] for e in extras_runs), 2),
        "batch_queries_per_sec": round(
            ex0["batch_scored"] / best["batch_queries_2000"], 1
        ),
        "minhash_pairs": ex0["minhash_pairs"],
        "distinct_terms": ex0["distinct_terms"],
        "curated_rows": ex0["curated_rows"],
        "clean_docs_per_sec": round(n_clean / clean_sec, 1),
        "decontam_bloom_sec": round(decon_sec, 3),
        "decontam_bloom_flagged": n_decon,
        "pii_docs_per_sec": round(n_pii / pii_sec, 1),
        "chunk_rows_per_sec": round(n_chunks / chunk_sec, 1),
        "span_dedup_docs_per_sec": round(n_span / span_sec, 1),
        "conv_assemble_convs_per_sec": round(n_convs / conv_sec, 1),
        "collocations_sec": round(colloc_sec, 3),
        "collocations_rows": n_colloc,
        "tfidf_rows_per_sec": round(n_tfidf / tfidf_sec, 1),
        "repeats": repeats,
        "spread": {
            k: [round(r[k], 3) for r in runs] for k in runs[0]
        },
        **big,
    }
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
