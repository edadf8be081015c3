"""Data mixing — per-source token budgeting + deterministic sampling.

Pretraining corpora are MIXTURES: each source (web crawl, books, code,
forums ...) contributes a target share of the token budget, capped by
what the source actually has. This module splits the problem the way a
100 TB pipeline must:

* :func:`source_token_counts` — DISTRIBUTED per-source totals: one
  pruned-column pass with an in-batch combiner, then a ``#sources``-row
  ``groupby(source).sum``. Nothing corpus-sized leaves the workers.
* :func:`waterfill_rates` — DRIVER-side planning math (pure function of
  the ≤ #sources totals): allocate ``budget × weight`` per source,
  capped at availability, redistributing surplus to unsaturated sources
  until the budget (or the corpus) is exhausted. O(#sources²) worst
  case — trivially driver-sized.
* :func:`mix_sample` — the DISTRIBUTED sampler: keep a document iff
  ``splitmix64(doc_id) <= threshold(rate_source)``. A pure function of
  the row (no RNG state, no coordination, reproducible across cluster
  sizes and engines — the shuffle/sampling modules' rule), so a DuckDB
  oracle can re-derive it bit-exactly and a resumed/re-run job keeps
  the identical sample. Sampling is per-document, so a source's kept
  TOKEN share matches its rate in expectation (document-exact token
  budgeting would be a knapsack; expectation is the standard practice).

Thresholds are integers fixed at plan time (:func:`sample_threshold`),
so engine and oracle share literal values — no float-rounding ambiguity
at the keep boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _splitmix64

_U64_MAX = (1 << 64) - 1


def sample_threshold(rate: float) -> int:
    """Integer keep-threshold for a sampling rate: keep iff
    ``splitmix64(doc_id) <= threshold``. rate ≤ 0 → -1 (keeps nothing);
    rate ≥ 1 → 2^64-1 (keeps everything). Tiny positive rates (below
    ~5.4e-20, where ``int(rate·2^64) - 1`` would underflow to -1) clamp
    to 0 — keep only ``h == 0`` — so a POSITIVE rate can never return
    the keep-NOTHING sentinel (which a uint64 cast would wrap to
    keep-EVERYTHING). Computed ONCE at plan time and shared verbatim by
    the engine and the SQL oracle."""
    if rate <= 0.0:
        return -1
    return min(max(int(rate * 2.0**64) - 1, 0), _U64_MAX)


def doc_token_counts(batch: pa.Table) -> np.ndarray:
    """Per-doc token counts over the [a-z0-9]+ runs of the lowered text
    — the pack_offsets/dedup tokenization convention (one vectorized
    pass; SQL twin: ``len(list_filter(string_split_regex(lower(text),
    '[^a-z0-9]+'), x -> x != ''))``)."""
    from ..stages.tokenize import token_codes_batch

    uniq, codes, lens, n = token_codes_batch(batch["text"], lower_first=True)
    real = np.fromiter((bool(t) for t in uniq), bool, len(uniq))
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(uniq):
        return np.bincount(doc_of[real[codes]], minlength=n).astype(np.int64)
    return np.zeros(n, np.int64)


def source_token_counts(sf_dir: str):
    """Dataset (source, n_docs, n_tokens): per-source corpus totals via
    an in-batch combiner + one bounded ``groupby(source)`` shuffle."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_tok = doc_token_counts(batch)
        # dictionary-encode + bincount: Python touches only the few
        # UNIQUE sources, never the rows
        enc = pc.fill_null(batch["source"], "").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        n_src = len(enc.dictionary)
        return pa.Table.from_pydict(
            {
                "source": enc.dictionary,
                "n_docs": np.bincount(codes, minlength=n_src).astype(np.int64),
                "n_tokens": np.bincount(
                    codes, weights=n_tok, minlength=n_src
                ).astype(np.int64),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )


def waterfill_rates(
    avail: dict[str, int], budget: float, weights: dict[str, float]
) -> dict[str, float]:
    """Token-budget waterfilling: each round splits the remaining budget
    across unsaturated sources in proportion to their weights, capping
    each at its availability; saturated sources drop out and their
    surplus redistributes. Terminates in ≤ #sources rounds. Returns the
    per-source sampling RATE (target/available, in [0, 1])."""
    active = {s for s in avail if avail[s] > 0 and weights.get(s, 0.0) > 0.0}
    target = {s: 0.0 for s in avail}
    remaining = min(float(budget), float(sum(avail[s] for s in active)))
    while remaining > 1e-9 and active:
        wsum = sum(weights[s] for s in active)
        gave = 0.0
        saturated = set()
        for s in sorted(active):
            share = remaining * weights[s] / wsum
            room = avail[s] - target[s]
            g = min(share, room)
            target[s] += g
            gave += g
            # relative tolerance: float share accumulation can leave
            # target a few ulps under avail — treat that as saturated
            # (and snap its rate to exactly 1.0 below)
            if avail[s] - target[s] <= 1e-9 * max(1.0, avail[s]):
                saturated.add(s)
        remaining -= gave
        if not saturated:
            break  # nothing capped: the whole remainder was placed
        active -= saturated
    out = {}
    for s in avail:
        if avail[s] <= 0:
            out[s] = 0.0
        elif avail[s] - target[s] <= 1e-9 * max(1.0, avail[s]):
            out[s] = 1.0
        else:
            out[s] = target[s] / avail[s]
    return out


def mix_plan(
    sf_dir: str, budget_tokens: float, weights: dict[str, float] | None = None
):
    """End-to-end plan: distributed per-source totals → waterfilled
    rates. Returns a pandas DataFrame (source, n_docs, n_tokens,
    rate, threshold) sorted by source — ≤ #sources rows ever reach the
    driver."""
    counts = source_token_counts(sf_dir).to_pandas()  # ≤ #sources rows
    avail = dict(zip(counts["source"], counts["n_tokens"].astype(int)))
    if weights is None:
        weights = {s: 1.0 for s in avail}
    rates = waterfill_rates(avail, budget_tokens, weights)
    counts = counts.sort_values("source").reset_index(drop=True)
    counts["rate"] = [rates[s] for s in counts["source"]]
    counts["threshold"] = [sample_threshold(r) for r in counts["rate"]]
    return counts


def mix_sample(sf_dir: str, rates: dict[str, float]):
    """Deterministic mixture sample: keep a document iff
    ``splitmix64(doc_id) <= sample_threshold(rates[source])``. Unknown
    or rate-0 sources keep nothing. NULL sources are keyed as ``""`` —
    the SAME normalization :func:`source_token_counts` uses, so a plan
    that budgeted tokens under ``""`` actually samples those docs.
    Output (doc_id, source, n_tokens) — one streaming pass, rates
    broadcast in the task closure (a #sources-sized dict)."""
    import ray.data as rd

    sources = sorted(s for s in rates if rates[s] > 0.0)
    thresholds = np.asarray(
        [sample_threshold(rates[s]) for s in sources], np.uint64
    )
    src_arr = pa.array(sources, pa.string())

    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        h = _splitmix64(ids)
        idx = pc.index_in(
            pc.fill_null(batch["source"], ""), value_set=src_arr
        )
        idx_np = idx.to_numpy(zero_copy_only=False)
        known = ~np.isnan(idx_np.astype(np.float64))
        thr = np.zeros(len(ids), np.uint64)
        ii = idx_np[known].astype(np.int64)
        thr[known] = thresholds[ii]
        keep = known & (h <= thr)
        n_tok = doc_token_counts(batch)
        kmask = pa.array(keep)
        return pa.Table.from_arrays(
            [
                batch["doc_id"].filter(kmask),
                batch["source"].filter(kmask),
                pa.array(n_tok[keep], pa.int64()),
            ],
            names=["doc_id", "source", "n_tokens"],
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
