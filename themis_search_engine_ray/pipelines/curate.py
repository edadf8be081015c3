"""End-to-end corpus curation — the operators composed as one pipeline.

``curate_corpus`` chains the individual training-data operators into
the canonical curation pass a 100 TB pipeline runs before training:

1. **exact dedup** — keep the min-doc_id copy of each distinct text;
2. **held-out exclusion** — drop the hash-derived benchmark split
   (the same ``md5(doc_id)[:4] <= hex`` rule the sampler uses);
3. **decontamination** — drop docs sharing ≥1 word k-gram with the
   held-out split (broadcast benchmark shingles, exact-verified);
4. **quality floor** — drop docs whose composite quality score
   (:func:`..pipelines.text_analysis.quality_batch`) is below the
   threshold;
5. **shuffle key** — the survivors get their deterministic training
   order key (:mod:`..pipelines.shuffle`).

Shape: ONE streaming tag pass (all per-row signals + the broadcast
shingle probe) and ONE ``groupby(text_hash)`` shuffle. The keep-min +
keepable decision rides the aggregate as an encoded key
(``doc_id*2 + (1 - keepable)``: the group min IS the min doc_id's
record, because any larger doc_id encodes strictly larger) so there is
no per-group Python at all — ``aggregate(Min)`` only. doc_id must fit
62 bits (documents ids do; the index build's 63-bit keys would use the
map_groups fallback).

Every ingredient is independently value-exact against DuckDB
(dedup_exact / decontaminate / quality_scores / shuffle_manifest), and
the composition itself is too — the oracle recombines the same SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .decontaminate import benchmark_shingles, shared_shingle_counts
from .text_analysis import quality_batch


# priority-aware keyed-Min layout: [prio: 4 bits][doc_id: 58][flag: 1]
_PRIO_SHIFT = 1 << 59
_PRIO_MAX = 15


def curate_corpus(
    sf_dir: str,
    quality_min: float = 0.70,
    held_hex: str = "0147",
    k: int = 3,
    seed: int = 0,
    source_priority: "dict[str, int] | None" = None,
):
    """(doc_id, shuffle_key) of the curated corpus: exact-deduped,
    held-out split removed, decontaminated, quality-floored, in
    deterministic shuffle order by key.

    ``source_priority`` (optional): rank per source, 0 = most
    preferred. Among duplicate texts the kept copy is the argmin of
    (priority, doc_id) — the standard multi-source curation rule
    (prefer the cleaner source when a crawl duplicates it). Rides the
    SAME single ``aggregate(Min)``: the priority packs into the high
    bits of the encoded key ([prio:4][doc_id:58][flag:1]), so there is
    still no per-group Python. Unlisted sources rank one below the
    worst listed, CLAMPED to the 4-bit priority space: if any listed
    source already has priority 15, unlisted sources TIE with it (the
    doc_id then breaks the tie, as always). Priorities must be in
    [0, 15] and doc_ids < 2^58 when a priority map is given (< 2^62
    otherwise)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    prio_map = None
    default_prio = 0
    if source_priority is not None:
        if any(not 0 <= p <= _PRIO_MAX for p in source_priority.values()):
            raise ValueError(
                f"source priorities must be in [0, {_PRIO_MAX}]: {source_priority}"
            )
        prio_map = dict(source_priority)
        default_prio = min(max(source_priority.values()) + 1, _PRIO_MAX)

    bset, bhash = benchmark_shingles(sf_dir, held_hex, k)
    ref = ray.put((bset, bhash))
    id_bound = 1 << 58 if prio_map is not None else 1 << 62

    cols = ["doc_id", "text"] + (["source"] if prio_map is not None else [])

    def tag(batch: pa.Table) -> pa.Table:
        from .dedup import md5_hex_array
        from .sampling import md5_prefix4_le

        bset_, bhash_ = ray.get(ref)
        ids = batch["doc_id"].to_numpy()
        th = md5_hex_array(batch["text"])
        held = md5_prefix4_le(ids.tolist(), held_hex)
        shared = shared_shingle_counts(batch["text"], bset_, bhash_, k)
        quality = quality_batch(batch)["quality_score"].to_numpy()
        keepable = (~held) & (shared == 0) & (quality >= quality_min)
        ids = ids.astype(np.int64)
        # the encoded min-key doubles the id: enforce the documented
        # bound instead of silently wrapping int64 (the index build's
        # own doc_key() ids are 63-bit and MUST NOT feed this path —
        # use a map_groups keep-min instead)
        if ids.size and (ids.max() >= id_bound or ids.min() < 0):
            raise ValueError(
                f"curate_corpus requires non-negative doc_ids < {id_bound} "
                "(the keep decision is encoded into the Min key); "
                f"got range [{ids.min()}, {ids.max()}]"
            )
        keyed = ids * 2 + (1 - keepable.astype(np.int64))
        if prio_map is not None:
            src = batch["source"].to_pylist()
            prio = np.fromiter(
                (prio_map.get(s or "", default_prio) for s in src),
                np.int64,
                len(src),
            )
            keyed = prio * _PRIO_SHIFT + keyed
        return pa.Table.from_pydict({"text_hash": th, "keyed": keyed})

    kept = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(Min("keyed", alias_name="kk"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        from .shuffle import _assign_keys

        kk = batch["kk"].to_numpy()
        if prio_map is not None:
            kk = kk % _PRIO_SHIFT  # strip the priority bits
        keep = kk % 2 == 0
        ids = (kk[keep] // 2).astype(np.int64)
        # num_shards=1: only the key column is wanted; _assign_keys is
        # the batch twin of the scalar _shuffle_key rule
        keys, _ = _assign_keys(ids.tolist(), seed, 1)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.int64()), "shuffle_key": keys}
        )

    return kept.map_batches(finish, batch_format="pyarrow")
