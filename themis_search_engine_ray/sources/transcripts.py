"""Transcript-corpus sources.

The engine's corpus is a Parquet table of multi-turn conversation /
agent transcripts with columns

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp[us])

(document = one turn, stable docID = (conv_id, turn_idx)). This module
provides:

* a deterministic synthetic generator (seeded, block-parallel, so the
  same (seed, n_turns) always yields the identical corpus at any
  parallelism — used by tests and bench; no external data),
* a derivation of the same shape from the driver test tables'
  ``documents.parquet`` (text passthrough, so the per-turn text-equality
  invariant and DuckDB oracles can compare against the pre-registered
  ``documents`` view),
* plain readers.

The generator's vocabulary follows FIXTURES.md: reference stopwords,
Porter-exercising morphological variants, Greek/unicode tokens (which
the ``[^a-zA-Z0-9]`` normalizer strips — exercising that path), digit
runs, punctuation-glued tokens, and a handful of very-high-df hot terms
(skew/salting exercise). Zipf-distributed draws.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["", "", "", "search", "python", "browser", "calculator"]

_MORPH = (
    "caresses ponies ties agreed disabled matting mating meeting milling messing "
    "meetings relational conditional rational valenci hesitanci digitizer conformabli "
    "radicalli differentli vileli analogousli vietnamization predication operator "
    "feudalism decisiveness hopefulness callousness formaliti sensitiviti sensibiliti "
    "triplicate formative formalize electriciti electrical hopeful goodness revival "
    "allowance inference airliner gyroscopic adjustable defensible irritant replacement "
    "adjustment dependent adoption homologou communism activate angulariti homologous "
    "effective bowdlerize probate rate cease controll roll"
).split()

_HOT = ["agent", "model", "token", "response", "data"]

_GREEK = ["αλφα", "βητα", "γαμμα", "δελτα"]

_GLUED = ["state-of-the-art", "end2end", "foo.bar", "x=42", "c++", "node.js", "(quoted)"]


def _build_vocab() -> list[str]:
    from ..functions.analyzer import STOPWORDS

    rng = np.random.RandomState(1234)
    syll = ["ra", "to", "min", "ver", "sol", "ke", "lan", "dor", "bi", "cu",
            "pre", "sta", "mo", "li", "zan", "te", "gor", "fi", "ny", "plex"]
    base = []
    for _ in range(1400):
        n = rng.randint(2, 5)
        base.append("".join(rng.choice(syll) for _ in range(n)))
    digits = [str(rng.randint(0, 100000)) for _ in range(40)] + ["2020", "90s", "0xff"]
    vocab = (
        sorted(STOPWORDS)
        + _MORPH
        + _HOT * 40  # duplicate slots boost hot-term draw probability further
        + _GREEK
        + _GLUED
        + digits
        + base
    )
    return vocab


_VOCAB: list[str] | None = None


def _vocab() -> list[str]:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = _build_vocab()
    return _VOCAB


def _block_seed(seed: int, block_id: int) -> int:
    h = hashlib.blake2b(f"{seed}:{block_id}".encode(), digest_size=8).digest()
    return int.from_bytes(h[:4], "little")


def generate_block(block_id: int, turns_per_block: int, seed: int = 42) -> pa.Table:
    """Generate one block of whole conversations, deterministically from
    (seed, block_id) alone — identical output at any parallelism."""
    vocab = _vocab()
    vsize = len(vocab)
    rng = np.random.RandomState(_block_seed(seed, block_id))
    # Zipf ranks over the vocab (clipped), mapped through a fixed permutation
    perm = np.random.RandomState(seed & 0x7FFFFFFF).permutation(vsize)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    produced = 0
    conv_no = 0
    base_ts = 1_700_000_000_000_000 + block_id * 10_000_000_000
    while produced < turns_per_block:
        conv_len = min(int(rng.randint(1, 13)), turns_per_block - produced)
        cid = f"conv-{block_id:06d}-{conv_no:05d}"
        conv_no += 1
        for ti in range(conv_len):
            n_words = int(rng.randint(3, 60))
            ranks = rng.zipf(1.35, size=n_words)
            ranks = np.clip(ranks, 1, vsize) - 1
            words = [vocab[perm[r]] for r in ranks]
            # occasional punctuation gluing / casing to exercise the normalizer
            if rng.rand() < 0.3:
                words[0] = words[0].upper() + ","
            if rng.rand() < 0.2 and len(words) > 2:
                words[1] = words[1] + "." + words[2]
            texts.append(" ".join(words))
            conv_ids.append(cid)
            turn_idxs.append(ti)
            roles.append(_ROLES[ti % len(_ROLES)])
            tools.append(_TOOLS[int(rng.randint(0, len(_TOOLS)))])
            tss.append(base_ts + produced * 1_000_000 + ti)
            produced += 1
    return pa.Table.from_arrays(
        [
            pa.array(conv_ids, pa.string()),
            pa.array(turn_idxs, pa.int32()),
            pa.array(roles, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(tools, pa.string()),
            pa.array(tss, pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def generate_table(n_turns: int, seed: int = 42, turns_per_block: int = 4096) -> pa.Table:
    """Whole corpus as one Arrow table (tests / small scale)."""
    blocks = []
    bid = 0
    left = n_turns
    while left > 0:
        take = min(turns_per_block, left)
        blocks.append(generate_block(bid, take, seed))
        bid += 1
        left -= take
    return pa.concat_tables(blocks) if blocks else TRANSCRIPT_SCHEMA.empty_table()


def synthetic_dataset(n_turns: int, seed: int = 42, turns_per_block: int = 4096):
    """Ray Dataset of synthetic transcripts, generated block-parallel
    (each input row drives one deterministic block — no driver-side
    materialization of the corpus)."""
    import ray.data as rd

    n_blocks = (n_turns + turns_per_block - 1) // turns_per_block
    last = n_turns - (n_blocks - 1) * turns_per_block

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for bid in batch["id"].to_pylist():
            take = last if bid == n_blocks - 1 else turns_per_block
            out.append(generate_block(bid, take, seed))
        return pa.concat_tables(out) if out else TRANSCRIPT_SCHEMA.empty_table()

    # no explicit batch_size: Ray would bundle the tiny id blocks into a
    # handful of tasks; default batching keeps one task per id block
    return rd.range(n_blocks).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True
    )


def write_synthetic(path: str, n_turns: int, seed: int = 42, turns_per_block: int = 4096) -> None:
    # small row groups keep the files splittable into many read tasks
    # (a single-row-group file caps downstream read/tokenize parallelism
    # at #files regardless of override_num_blocks)
    synthetic_dataset(n_turns, seed, turns_per_block).write_parquet(
        path, row_group_size=1024
    )


TURNS_PER_CONV = 8  # documents-derivation fanout (fixed, mirrored in SQL)


def derive_sql_cte() -> str:
    """SQL producing the same transcripts the engine derives from the
    pre-registered ``documents`` view — keep in lockstep with
    :func:`from_documents` (role = _ROLES[turn_idx % 4], like the
    synthetic generator)."""
    return (
        "SELECT 'conv-' || lpad(CAST(doc_id // {n} AS VARCHAR), 8, '0') AS conv_id, "
        "CAST(doc_id % {n} AS INTEGER) AS turn_idx, text, "
        "['user', 'assistant', 'system', 'tool'][(doc_id % {n}) % 4 + 1] AS role "
        "FROM documents"
    ).format(n=TURNS_PER_CONV)


def from_documents(sf_dir: str):
    """Derive a transcript Dataset from ``{sf_dir}/documents.parquet``:
    conv_id groups every TURNS_PER_CONV docs, text is passed through
    unchanged (per-turn text equality vs the ``documents`` view), role
    cycles through _ROLES by turn (mirrored in derive_sql_cte)."""
    import ray.data as rd

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy()
        conv = [f"conv-{d // TURNS_PER_CONV:08d}" for d in doc_id]
        turn = (doc_id % TURNS_PER_CONV).astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(conv, pa.string()),
                pa.array(turn),
                batch["text"],
                pa.array([_ROLES[int(t) % len(_ROLES)] for t in turn], pa.string()),
            ],
            names=["conv_id", "turn_idx", "text", "role"],
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )


def read_transcripts(path: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)
