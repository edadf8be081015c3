"""Text-analysis operators for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms over the
``documents`` table (or any (id, text) table):

* token/char counts (whitespace + alnum-regex "BPE-ish" tokenizations),
* quality scoring (length / punctuation / stopword / repetition ratios),
* language identification (stopword-profile n-gram-free heuristic over a
  small built-in profile set — en/de/fr/es/it; actor-pool stage so the
  profiles are built once per actor),
* document fingerprinting (winnowing over rolling Karp-Rabin hashes).

Scale notes: every stage is embarrassingly parallel (no shuffle); the
only state (language profiles, compiled regexes) lives in actor
``__init__``. Ratios are rounded to 6 decimals so DuckDB oracles can
hash-compare values.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.analyzer import STOPWORDS
from ..functions.rounding import round_half_up

_ALNUM_RE = re.compile(r"[A-Za-z0-9]+")
# a BPE-ish pretokenizer: words, numbers, or single non-space symbols
_BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def token_counts_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars, n_ws_tokens, n_alnum_tokens, n_bpeish_tokens).

    All three token counts are RE2 ``count_substring_regex`` kernels —
    no per-row Python, and the whitespace rule is RE2's ``\\s`` on BOTH
    sides of the oracle (``str.split()`` additionally splits on unicode
    whitespace like NBSP, which the SQL ``string_split_regex('\\s+')``
    oracle never did — the vectorized count removes that latent
    divergence)."""
    t = pc.fill_null(batch["text"], "")
    counts = [
        pc.count_substring_regex(t, pat)
        for pat in (r"\S+", _ALNUM_RE.pattern, _BPEISH_RE.pattern)
    ]
    return pa.Table.from_arrays(
        [
            batch["doc_id"],
            # n_chars on the ORIGINAL column: null text stays null,
            # matching the oracle's length(text)
            pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            *[pc.cast(c, pa.int64()) for c in counts],
        ],
        names=["doc_id", "n_chars", "n_ws_tokens", "n_alnum_tokens", "n_bpeish_tokens"],
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality heuristics per doc, all ratios rounded to 6 decimals:
    stopword_ratio, unique_ratio (distinct/total tokens), mean_token_len,
    alnum_char_ratio, plus a composite quality_score in [0,1]."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    cols = {
        "n_tokens": np.zeros(n, np.int64),
        "stopword_ratio": np.zeros(n, np.float64),
        "unique_ratio": np.zeros(n, np.float64),
        "mean_token_len": np.zeros(n, np.float64),
        "alnum_char_ratio": np.zeros(n, np.float64),
        "quality_score": np.zeros(n, np.float64),
    }
    for i, t in enumerate(texts):
        t = t or ""
        toks = [w.lower() for w in _ALNUM_RE.findall(t)]
        nt = len(toks)
        cols["n_tokens"][i] = nt
        nchars = len(t)
        alnum_chars = sum(len(w) for w in toks)
        if nt:
            stop = sum(1 for w in toks if w in STOPWORDS)
            cols["stopword_ratio"][i] = round_half_up(stop / nt, 6)
            cols["unique_ratio"][i] = round_half_up(len(set(toks)) / nt, 6)
            cols["mean_token_len"][i] = round_half_up(alnum_chars / nt, 6)
        if nchars:
            cols["alnum_char_ratio"][i] = round_half_up(alnum_chars / nchars, 6)
        # composite: favor mid stopword ratio, diversity, sane token length
        sw, uq, ml = cols["stopword_ratio"][i], cols["unique_ratio"][i], cols["mean_token_len"][i]
        score = (
            (1.0 - abs(sw - 0.4)) * 0.3
            + min(uq * 1.25, 1.0) * 0.4
            + (1.0 - min(abs(ml - 5.0) / 5.0, 1.0)) * 0.3
        )
        cols["quality_score"][i] = round_half_up(max(0.0, min(1.0, score)), 6)
    arrays = [batch["doc_id"]] + [pa.array(v) for v in cols.values()]
    return pa.Table.from_arrays(arrays, names=["doc_id"] + list(cols))


_LANG_PROFILES = {
    "en": "the of and to in is was for that it on as with by at he she this are be have not",
    "de": "der die das und ist von zu den mit nicht ein eine im auf für sich des dem war er",
    "fr": "le la les des et de un une est dans que pour qui sur pas au avec il elle ne ce",
    "es": "el la los las de y que en un una es por con no para su al lo como más se",
    "it": "il la le di e che un una è per in non con del si da sono come più anche",
}


class LangIdBatcher:
    """Actor-pool language-ID stage: profile sets built once per actor.

    Heuristic: argmax over per-language weighted stopword-hit rate; falls
    back to 'und' (undetermined) when no profile word is seen.
    """

    def __init__(self):
        self.profiles = {
            lang: frozenset(words.split()) for lang, words in _LANG_PROFILES.items()
        }
        self.word_re = re.compile(r"[a-zA-ZäöüßéèêàçñáíóúìòùÄÖÜ]+")
        self.order = sorted(self.profiles)  # deterministic tie-break

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = []
        confs = []
        for t in texts:
            toks = [w.lower() for w in self.word_re.findall(t or "")]
            if not toks:
                preds.append("und")
                confs.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang in self.order:
                prof = self.profiles[lang]
                hits = sum(1 for w in toks if w in prof)
                rate = hits / len(toks)
                if rate > best:
                    best_lang, best = lang, rate
            preds.append(best_lang if best > 0.02 else "und")
            confs.append(round_half_up(best, 6))
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(preds, pa.string()), pa.array(confs)],
            names=["doc_id", "lang_pred", "lang_conf"],
        )


def lang_by_source(sf_dir: str):
    """Language × source cross-tab — the routing table a multilingual
    curation pipeline keys its per-language branches on. Output:
    (source, lang_pred, n_docs).

    Composes the proven :class:`LangIdBatcher` stage (profiles built
    once per actor) with an in-batch count reduction: every batch
    leaves as ≤ #sources × #languages count rows, so the single final
    ``groupby((source, lang)).sum`` is bounded by the cross-tab size,
    not the corpus. NULL sources count under ``""`` (the mixing key
    rule)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    class _Counter(LangIdBatcher):
        def __call__(self, batch: pa.Table) -> pa.Table:
            pred = LangIdBatcher.__call__(self, batch)["lang_pred"]
            src = pc.fill_null(batch["source"], "")
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            if isinstance(pred, pa.ChunkedArray):
                pred = pred.combine_chunks()
            ds_ = src.dictionary_encode()
            dl = pred.dictionary_encode()
            sc = ds_.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            lc = dl.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            nl = len(dl.dictionary)
            key = sc * max(1, nl) + lc
            uk, cnt = np.unique(key, return_counts=True)
            return pa.Table.from_arrays(
                [
                    ds_.dictionary.take(pa.array(uk // max(1, nl))),
                    dl.dictionary.take(pa.array(uk % max(1, nl))),
                    pa.array(cnt.astype(np.int64)),
                ],
                names=["source", "lang_pred", "n_docs"],
            )

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        .map_batches(
            _Counter,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=2,
            batch_size=2048,
        )
        .groupby(["source", "lang_pred"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def _karp_rabin(tokens: list[str], k: int) -> np.ndarray:
    """Rolling 64-bit hashes of k-grams of tokens (vectorized-ish)."""
    if len(tokens) < k:
        return np.empty(0, np.uint64)
    hs = np.array(
        [hash_token(t) for t in tokens], dtype=np.uint64
    )
    n = len(tokens) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    B = np.uint64(1099511628211)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
        for j in range(k):
            out = out * B + hs[j : j + n]
    return out


def hash_token(t: str) -> int:
    # FNV-1a, mod 2^64
    h = 14695981039346656037
    for ch in t.encode():
        h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


class FingerprintBatcher:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    k-gram rolling hashes, window-min selection, hashed to a compact
    signature set. Emits (doc_id, fingerprint: list<uint64>, sig64)."""

    def __init__(self, k: int = 4, window: int = 5):
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re as _re

        texts = batch["text"].to_pylist()
        fps = []
        sig64 = np.zeros(len(texts), dtype=np.int64)
        word_re = _re.compile(r"[a-z0-9]+")
        for i, t in enumerate(texts):
            toks = word_re.findall((t or "").lower())
            hs = _karp_rabin(toks, self.k)
            if hs.size == 0:
                fps.append([])
                continue
            w = min(self.window, hs.size)
            # window minima (winnowing): min over each sliding window
            from numpy.lib.stride_tricks import sliding_window_view

            mins = sliding_window_view(hs, w).min(axis=1)
            sel = np.unique(mins)
            fps.append(sel.astype(np.int64).tolist())
            acc = np.uint64(0)
            for v in sel:
                acc ^= np.uint64(v)
            sig64[i] = np.int64(acc.astype(np.int64))
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(fps, pa.list_(pa.int64())), pa.array(sig64)],
            names=["doc_id", "fingerprint", "sig64"],
        )


def token_counts(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        token_counts_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_scores(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def lang_id(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        LangIdBatcher, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=2, batch_size=2048,
    )


def fingerprints(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        FingerprintBatcher, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=2, batch_size=2048,
    )


def unigram_logprob(sf_dir: str):
    """Per-doc mean unigram log-probability under the corpus's own token
    distribution — the classic cheap perplexity-style quality signal.

    Two passes: (1) exact corpus token counts via per-batch counting +
    ``groupby(term).sum`` (rows = distinct (term, batch), never raw
    tokens); (2) the count table broadcast once (``ray.put``) and each
    doc scored vectorized. At 100 TB the broadcast side switches to the
    Misra-Gries top-M counts from :mod:`.sketches` plus a floor
    probability for the tail — the two-pass shape is unchanged.

    Output: (doc_id, n_tokens, mean_logprob) with mean_logprob =
    mean(ln(count(tok)/N)) over the doc's tokens (0.0 for empty docs),
    rounded to 6 decimals.
    """
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count_rows(batch: pa.Table) -> pa.Table:
        from ..stages.tokenize import batch_token_counts

        toks, counts = batch_token_counts(batch["text"])
        return pa.Table.from_pydict(
            {
                "term": pa.array(toks, pa.string()),
                "count": pa.array(counts.astype(np.int64)),
            }
        )

    freq_tab = (
        ds.map_batches(count_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
    )
    total = float(freq_tab["count"].sum())
    logp = {
        t: math.log(c / total)
        for t, c in zip(freq_tab["term"], freq_tab["count"])
    }
    ref = ray.put((logp, total))

    def score(batch: pa.Table) -> pa.Table:
        from ..stages.tokenize import token_codes_batch

        lp, _ = ray.get(ref)
        uniq, codes, lens, n = token_codes_batch(batch["text"])
        # per-unique lookup (Python touches the batch vocabulary only);
        # '' split artifacts get weight 0 and are excluded from counts
        lp_of = np.zeros(max(1, len(uniq)), np.float64)
        real = np.zeros(max(1, len(uniq)), bool)
        for u, tok in enumerate(uniq):
            if tok:
                lp_of[u] = lp[tok]
                real[u] = True
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = real[codes]
        kd = doc_of[keep]
        n_tok = np.bincount(kd, minlength=n).astype(np.int64)
        # bincount accumulates in input order == token order per doc, the
        # same IEEE sum sequence as the scalar loop it replaces
        sums = np.bincount(kd, weights=lp_of[codes][keep], minlength=n)
        mean_lp = np.zeros(n, np.float64)
        nz = n_tok > 0
        mean_lp[nz] = round_half_up(sums[nz] / n_tok[nz], 6)
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(n_tok), pa.array(mean_lp)],
            names=["doc_id", "n_tokens", "mean_logprob"],
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def repetition_scores(sf_dir: str, k: int = 3):
    """Within-document repetition (Gopher-style quality filter): per doc,
    the total and DISTINCT word ``k``-gram counts and the duplicate
    fraction ``1 - distinct/total`` (0 for docs too short to have a
    k-gram). Highly repetitive machine-generated or boilerplate text
    scores high and gets filtered before training.

    One embarrassingly-parallel ``map_batches`` pass, no shuffle:
    distinct k-grams come from the dedup family's vectorized per-doc
    shingle hashing (:func:`..pipelines.dedup._shingle_hashes_batch`;
    a 64-bit collision inside one document undercounts distinct with
    probability ~(kgrams²)/2⁶⁵ — negligible), totals from the per-doc
    token counts. Tokenization = ``[a-z0-9]+`` runs of the lowered text
    (the dedup/oracle convention). Rounded to 6 for the DuckDB oracle.
    """
    import ray.data as rd

    from .dedup import _shingle_hashes_batch

    def rep_batch(batch: pa.Table) -> pa.Table:
        # one tokenize pass: counts ride along with the shingle hashes
        d_idx, _sh, n, n_tok = _shingle_hashes_batch(
            batch["text"], k, return_token_counts=True
        )
        total = np.maximum(n_tok - (k - 1), 0)
        distinct = np.bincount(d_idx, minlength=n).astype(np.int64)
        frac = np.zeros(n, np.float64)
        m = total > 0
        frac[m] = round_half_up(1.0 - distinct[m] / total[m], 6)
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(total),
                pa.array(distinct),
                pa.array(frac),
            ],
            names=["doc_id", "n_kgrams", "n_distinct_kgrams", "dup_kgram_frac"],
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(rep_batch, batch_format="pyarrow", zero_copy_batch=True)


# C4-style rule-based scrubbing: every rule is an RE2 pattern, so the
# whole transform is vectorized C (pyarrow.compute) AND bit-identical
# in the DuckDB oracle (DuckDB's regexp_* are RE2 too — parity is a
# property of sharing the engine, not a coincidence). RE2 has no
# backreferences, so rules needing them (e.g. repeated-word collapse)
# belong in repetition_scores' k-gram machinery instead.
# \S (not a hand-rolled char class): the URL stops at everything RE2
# counts as whitespace — space \t \n \f \r — so a stray carriage
# return/form feed can't let the match swallow the following words.
# (RE2's \s does NOT include \v; both pyarrow and DuckDB agree, so
# engine/oracle parity holds either way.)
CLEAN_URL_RE = r"https?://\S+"
CLEAN_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
CLEAN_SINGLE_RE = r"\b[A-Za-z0-9]\b"  # standalone 1-char tokens
CLEAN_WS_RE = r"\s+"


def clean_text_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, clean_text, n_urls, n_emails, n_single) — URLs and
    e-mail addresses scrubbed, standalone single-character tokens
    dropped, whitespace collapsed + trimmed; the removal counts are
    emitted so downstream filters can threshold on them."""
    import pyarrow.compute as pc

    t = batch["text"]
    n_urls = pc.count_substring_regex(t, CLEAN_URL_RE)
    n_emails = pc.count_substring_regex(t, CLEAN_EMAIL_RE)
    n_single = pc.count_substring_regex(t, CLEAN_SINGLE_RE)
    c = pc.replace_substring_regex(t, pattern=CLEAN_URL_RE, replacement=" ")
    c = pc.replace_substring_regex(c, pattern=CLEAN_EMAIL_RE, replacement=" ")
    c = pc.replace_substring_regex(c, pattern=CLEAN_SINGLE_RE, replacement=" ")
    c = pc.replace_substring_regex(c, pattern=CLEAN_WS_RE, replacement=" ")
    c = pc.utf8_trim_whitespace(c)
    return pa.Table.from_arrays(
        [
            batch["doc_id"],
            c,
            pc.cast(n_urls, pa.int64()),
            pc.cast(n_emails, pa.int64()),
            pc.cast(n_single, pa.int64()),
        ],
        names=["doc_id", "clean_text", "n_urls", "n_emails", "n_single"],
    )


def clean_text(sf_dir: str):
    """Rule-based text scrubbing over the documents table — one
    streaming pruned-column pass, all-RE2 vectorized kernels."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        clean_text_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# PII redaction — the same engine-shared RE2 contract as the C4 rules
# above (pyarrow.compute and DuckDB both wrap RE2, so the oracle is
# bit-exact by construction). Shapes covered: e-mail addresses,
# SSN-shaped ids (3-2-4 digits), 16-digit grouped card numbers,
# NANP-style phone numbers with an optional +CC prefix, dotted-quad
# IPv4 literals. RE2 has no lookaround, so boundaries are \b-anchored
# heuristics: a rule may over-match inside exotic digit runs — the
# rules are ordered most-specific-first (card before phone) and each
# rule COUNTS on the text as already redacted by the previous rules,
# so one digit run is attributed to exactly one category.
PII_EMAIL_RE = CLEAN_EMAIL_RE
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PII_CC_RE = r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b"
# \b sits AFTER the optional "(" / "+1 " prefix: a boundary before "+"
# would reject " +1 555…" (space|+ is non-word|non-word).
PII_PHONE_RE = r"(?:\+\d{1,2}[ .-]?)?\(?\b\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b"
PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

# (count-column suffix, RE2 pattern, replacement token) — ORDER IS THE
# CONTRACT: e-mail first (its local part can contain digit runs), then
# ssn/card/phone from most- to least-specific digit shape, IPs last.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("ssn", PII_SSN_RE, "<SSN>"),
    ("cc", PII_CC_RE, "<CC>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
    ("ip", PII_IP_RE, "<IP>"),
]


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, redacted_text, n_email, n_ssn, n_cc, n_phone, n_ip) —
    each PII shape replaced by its ``<TOKEN>``, counts taken rule by
    rule on the progressively redacted text (see PII_RULES order)."""
    t = batch["text"]
    counts = []
    for _, pat, tok in PII_RULES:
        counts.append(pc.cast(pc.count_substring_regex(t, pat), pa.int64()))
        t = pc.replace_substring_regex(t, pattern=pat, replacement=tok)
    return pa.Table.from_arrays(
        [batch["doc_id"], t, *counts],
        names=["doc_id", "redacted_text"] + [f"n_{n}" for n, _, _ in PII_RULES],
    )


def pii_redact(sf_dir: str):
    """PII scrubbing over the documents table — one streaming
    pruned-column pass, all-RE2 vectorized kernels, no shuffle."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(pii_redact_batch, batch_format="pyarrow", zero_copy_batch=True)


# Fixed-token sliding-window chunking (the training-data complement of
# pack_offsets: packing joins short docs, chunking splits long ones).
# Tokenization = the [a-z0-9]+ runs of lower(text) — the SAME shared
# convention as dedup shingling / pack_offsets / mixing token counts.
CHUNK_MAX_TOKENS = 64
CHUNK_OVERLAP = 8


def chunk_documents_batch(
    batch: pa.Table,
    max_tokens: int = CHUNK_MAX_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> pa.Table:
    """(doc_id, chunk_idx, n_tokens, chunk_text): chunk k covers token
    positions [k·stride, k·stride + max_tokens) with stride =
    max_tokens − overlap; chunks are emitted until one reaches the
    document's end (a doc shorter than max_tokens yields exactly one
    chunk; an empty doc yields none), so consecutive chunks share
    ``overlap`` tokens and no chunk is a strict suffix of its
    predecessor. Whole-batch vectorized: one tokenize pass, chunk/token
    fan-out as numpy ragged gathers, text rebuilt by one
    ``binary_join`` — no per-row Python."""
    from ..stages.tokenize import token_codes_batch

    stride = max_tokens - overlap
    if stride < 1:
        raise ValueError(f"overlap {overlap} must be < max_tokens {max_tokens}")
    uniq, codes, lens, n = token_codes_batch(batch["text"], lower_first=True)
    doc_of_all = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(uniq):
        real = np.fromiter((bool(t) for t in uniq), bool, len(uniq))
        keep = real[codes]
    else:
        keep = np.zeros(0, bool)
    doc_of = doc_of_all[keep]
    tok_codes = codes[keep]
    nt = np.bincount(doc_of, minlength=n).astype(np.int64)
    doc_tok_off = np.zeros(n + 1, np.int64)
    np.cumsum(nt, out=doc_tok_off[1:])

    n_chunks = np.where(
        nt > 0, 1 + (np.maximum(nt - max_tokens, 0) + stride - 1) // stride, 0
    ).astype(np.int64)
    total = int(n_chunks.sum())
    chunk_doc = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    coff = np.zeros(n + 1, np.int64)
    np.cumsum(n_chunks, out=coff[1:])
    chunk_k = np.arange(total, dtype=np.int64) - np.repeat(coff[:-1], n_chunks)
    chunk_start = chunk_k * stride
    chunk_len = np.minimum(max_tokens, nt[chunk_doc] - chunk_start)

    toff = np.zeros(total + 1, np.int64)
    np.cumsum(chunk_len, out=toff[1:])
    n_out = int(toff[-1])
    within = np.arange(n_out, dtype=np.int64) - np.repeat(toff[:-1], chunk_len)
    gidx = (
        doc_tok_off[chunk_doc].repeat(chunk_len)
        + chunk_start.repeat(chunk_len)
        + within
    )
    tok_strings = pa.array(uniq, pa.string()).take(pa.array(tok_codes[gidx]))
    chunks = pa.ListArray.from_arrays(
        pa.array(toff, pa.int32()), tok_strings.combine_chunks()
        if isinstance(tok_strings, pa.ChunkedArray)
        else tok_strings,
    )
    return pa.Table.from_arrays(
        [
            batch["doc_id"].take(pa.array(chunk_doc)),
            pa.array(chunk_k, pa.int64()),
            pa.array(chunk_len, pa.int64()),
            pc.binary_join(chunks, " "),
        ],
        names=["doc_id", "chunk_idx", "n_tokens", "chunk_text"],
    )


def chunk_documents(
    sf_dir: str,
    max_tokens: int = CHUNK_MAX_TOKENS,
    overlap: int = CHUNK_OVERLAP,
):
    """Sliding-window document chunking over the documents table — one
    streaming pruned-column pass, no shuffle; output rows ≈ corpus
    tokens / stride regardless of document skew (a 1M-token doc fans
    out to ~18k bounded rows inside its batch, never one giant row)."""
    import ray.data as rd

    def fn(batch: pa.Table) -> pa.Table:
        return chunk_documents_batch(batch, max_tokens, overlap)

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def source_profile(sf_dir: str):
    """Corpus profiling report, one row per source: ``(source, n_docs,
    total_chars, total_tokens, mean_tokens)`` — the one-pass summary a
    curation run starts from.

    Scale design: per-batch partial sums per source (one
    dictionary-encode + three ``np.add.at`` scatters) reduce every
    batch to ≤ #sources tiny rows, so the ``groupby(source)`` exchange
    moves O(sources × blocks) rows regardless of corpus size; the
    integer sums make the aggregate accumulation-order-exact, and the
    final mean is ONE float division of two exact ints (deterministic
    on any engine), rounded half-up to 6 decimals like the quality
    ratios. NULL sources report under ""."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_up

    def partial(batch: pa.Table) -> pa.Table:
        src = pc.fill_null(batch["source"], "")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        t = pc.fill_null(batch["text"], "")
        chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = (
            pc.count_substring_regex(t, _ALNUM_RE.pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_docs = np.bincount(idx, minlength=k).astype(np.int64)
        sum_chars = np.zeros(k, np.int64)
        np.add.at(sum_chars, idx, chars)
        sum_toks = np.zeros(k, np.int64)
        np.add.at(sum_toks, idx, toks)
        return pa.Table.from_arrays(
            [
                enc.dictionary,
                pa.array(n_docs),
                pa.array(sum_chars),
                pa.array(sum_toks),
            ],
            names=["source", "n_docs", "total_chars", "total_tokens"],
        )

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch["n_docs"].to_numpy().astype(np.int64)
        tt = batch["total_tokens"].to_numpy().astype(np.int64)
        mean = round_half_up(tt / np.maximum(nd, 1), 6)
        return batch.append_column("mean_tokens", pa.array(mean, pa.float64()))

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "source"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def collocations_pmi(sf_dir: str, min_count: int = 5):
    """Bigram collocation mining by pointwise mutual information:
    ``pmi(a,b) = ln( (c_ab/N_b) / ((c_a/N_u)(c_b/N_u)) )`` over adjacent
    token pairs within a document, for pairs seen ≥ ``min_count`` times.
    Output: (w1, w2, pair_count, pmi).

    Shape: one counting pass — each batch emits its LOCAL distinct
    (w1, w2, count) rows (unigrams ride along as ``w2 = ''``, which the
    tokenizer can never produce) — then ONE ``groupby((w1, w2)).sum``;
    the reduced count table is materialized (it is vocabulary²-bounded
    and min_count-prunable, not corpus-sized) and scored vectorized
    with the unigram slice broadcast once via ``ray.put`` — the same
    broadcast contract as :func:`unigram_logprob`, with the same
    documented 100-TB fallback (Misra-Gries top-M unigrams + count
    floor; bigrams below ``min_count`` never leave the reduce anyway).

    Tokenization is the M1 convention (:func:`token_codes_batch`
    default), matching the SQL twin. Edge empty-string artifacts sit at
    document boundaries only, so masking them never fabricates a false
    adjacency.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def emit(batch: pa.Table) -> pa.Table:
        from ..stages.tokenize import kept_token_codes

        uniq, codes, doc_of, n = kept_token_codes(batch["text"])
        v = max(1, len(uniq))
        ucodes, ucounts = np.unique(codes, return_counts=True)
        adj = doc_of[1:] == doc_of[:-1]
        pair_key = codes[:-1][adj] * v + codes[1:][adj]
        pkeys, pcounts = np.unique(pair_key, return_counts=True)
        w1 = [uniq[c] for c in ucodes] + [uniq[k // v] for k in pkeys]
        w2 = [""] * len(ucodes) + [uniq[k % v] for k in pkeys]
        return pa.Table.from_pydict(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "count": np.concatenate([ucounts, pcounts]).astype(np.int64),
            }
        )

    counts = (
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w1", "w2"])
        .aggregate(Sum("count", alias_name="count"))
        .materialize()  # vocab²-bounded reduced table, NOT the corpus
    )

    # grand total − unigram total = bigram total; Dataset.sum returns
    # None on an empty dataset (empty corpus), which also means no
    # bigrams can survive min_count — emit the empty result directly
    total = counts.sum(on="count")
    if total is None:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.Table.from_pydict(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "pair_count": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        )
    uni = counts.map_batches(
        lambda b: b.filter(pc.equal(b["w2"], "")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    n_u = float(uni["count"].sum())
    n_b = float(int(total) - int(n_u))
    uni_terms = pa.array(uni["w1"].to_numpy(), pa.string())
    uni_counts = uni["count"].to_numpy().astype(np.float64)
    ref = ray.put((uni_terms, uni_counts, n_u, n_b))

    def score(batch: pa.Table) -> pa.Table:
        terms, uc, nu, nb = ray.get(ref)
        m = pc.and_(
            pc.not_equal(batch["w2"], ""),
            pc.greater_equal(batch["count"], min_count),
        )
        sub = batch.filter(m)
        cab = sub["count"].to_numpy().astype(np.float64)
        ca = uc[
            pc.index_in(sub["w1"], value_set=terms)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        ]
        cb = uc[
            pc.index_in(sub["w2"], value_set=terms)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        ]
        # identical IEEE op order as the SQL twin:
        # ln((cab/nb) / ((ca/nu) * (cb/nu)))
        pmi = round_half_up(
            np.log((cab / nb) / ((ca / nu) * (cb / nu))), 6
        )
        return pa.Table.from_arrays(
            [
                sub["w1"],
                sub["w2"],
                sub["count"],
                pa.array(pmi, pa.float64()),
            ],
            names=["w1", "w2", "pair_count", "pmi"],
        )

    return counts.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def hist_order_stat(vals: np.ndarray, ccum: np.ndarray, q: float) -> float:
    """quantile_cont over the integer multiset described by a histogram
    (``vals`` ascending distinct values, ``ccum`` cumulative counts) —
    bit-equal to DuckDB's interpolation over the expanded sorted array
    (property-tested), without ever expanding it."""
    n_total = int(ccum[-1])
    if n_total == 1:
        return float(vals[0])
    rn = (n_total - 1) * q
    lo = int(np.floor(rn))
    hi = int(np.ceil(rn))
    x_lo = float(vals[np.searchsorted(ccum, lo, side="right")])
    x_hi = float(vals[np.searchsorted(ccum, hi, side="right")])
    return x_lo + (rn - lo) * (x_hi - x_lo)


def length_filter(sf_dir: str, lo_q: float = 0.05, hi_q: float = 0.95):
    """Length-band curation filter: keep documents whose alnum token
    count lies inside the corpus-global ``[quantile(lo_q),
    quantile(hi_q)]`` band (the classic "drop the shortest 5% and the
    longest 5%" pass). Output: (doc_id, n_tokens).

    The global quantiles are EXACT without sorting the corpus: token
    counts are small integers, so each batch reduces to a (n_tokens,
    cnt) histogram partial, one bounded ``groupby(n_tokens).sum``
    merges them, and the driver reads back only the histogram (≤ max
    doc length rows, never the corpus) to take the order statistic
    with DuckDB's ``quantile_cont`` interpolation op order
    (:func:`~..pipelines.sampling._quantile_cont`). The second pass
    filters against the two broadcast scalars — no shuffle, no sort,
    two streaming reads total."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def hist(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        n = (
            pc.count_substring_regex(t, _ALNUM_RE.pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        vals, cnts = np.unique(n, return_counts=True)
        return pa.Table.from_pydict(
            {"n_tokens": vals, "cnt": cnts.astype(np.int64)}
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    h = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_tokens")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("n_tokens")
    )
    vals = h["n_tokens"].to_numpy().astype(np.int64)
    ccum = np.cumsum(h["cnt"].to_numpy().astype(np.int64))
    n_total = int(ccum[-1]) if ccum.size else 0
    if n_total == 0:
        return ds.map_batches(
            lambda b: pa.Table.from_pydict(
                {"doc_id": pa.array([], b["doc_id"].type), "n_tokens": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )

    lo_v = hist_order_stat(vals, ccum, lo_q)
    hi_v = hist_order_stat(vals, ccum, hi_q)

    def keep(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        n = pc.cast(
            pc.count_substring_regex(t, _ALNUM_RE.pattern), pa.int64()
        )
        f = pc.cast(n, pa.float64())
        mask = pc.and_(pc.greater_equal(f, lo_v), pc.less_equal(f, hi_v))
        return pa.Table.from_arrays(
            [batch["doc_id"].filter(mask), n.filter(mask)],
            names=["doc_id", "n_tokens"],
        )

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def vocab_growth(
    sf_dir: str, thresholds: "tuple[int, ...]" = (10, 50, 100, 250, 500)
):
    """Vocabulary growth curve (the Heaps'-law diagnostic): the number
    of distinct tokens among the first ``N`` documents (``doc_id <
    N``), for a ladder of ``N``. Output: (n_docs, n_terms), rows only
    for thresholds with at least one term.

    One pass + one vocab-bounded shuffle: each batch emits its (term,
    min doc_id) partials, ``groupby(term).Min`` merges them (Min is
    the semilattice that makes per-batch partials lossless), then a
    second map reduces every batch of first-occurrences to ≤
    len(thresholds) partial-count rows (searchsorted + reversed
    cumulative bincount — a term counts toward every threshold above
    its first doc) and a final bounded ``groupby(n_docs).sum``
    finishes. Nothing vocabulary-sized ever reaches the driver."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    thr = np.asarray(sorted(thresholds), np.int64)

    def first_seen(batch: pa.Table) -> pa.Table:
        from ..stages.tokenize import kept_token_codes

        uniq, codes, doc_of, n = kept_token_codes(batch["text"])
        ids = batch["doc_id"].to_numpy().astype(np.int64)[doc_of]
        order = np.lexsort((ids, codes))
        c_s, i_s = codes[order], ids[order]
        first = np.ones(c_s.size, bool)
        if c_s.size:
            first[1:] = c_s[1:] != c_s[:-1]
        return pa.Table.from_pydict(
            {
                "term": pa.array([uniq[c] for c in c_s[first]], pa.string()),
                "first_doc": i_s[first],
            }
        )

    def partial_counts(batch: pa.Table) -> pa.Table:
        fd = batch["first_doc"].to_numpy().astype(np.int64)
        idx = np.searchsorted(thr, fd, side="right")
        per = np.bincount(idx, minlength=thr.size + 1)[: thr.size]
        cnt = np.cumsum(per)  # terms first seen before each threshold
        m = cnt > 0
        return pa.Table.from_pydict(
            {"n_docs": thr[m], "n_terms": cnt[m].astype(np.int64)}
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(first_seen, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Min("first_doc", alias_name="first_doc"))
        .map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_docs")
        .aggregate(Sum("n_terms", alias_name="n_terms"))
    )


def length_quantiles_by_source(
    sf_dir: str, quantiles: "tuple[float, ...]" = (0.25, 0.5, 0.75, 0.95)
):
    """Per-source document-length distribution: exact
    ``quantile_cont`` of the alnum token count within each source —
    the per-ingest-source shape report that length filtering policies
    are tuned against. Output: (source, n_docs, q25, q50, q75, q95).

    Same exact-histogram trick as :func:`length_filter`, partitioned:
    token counts are small integers, so each batch reduces to
    (source, n_tokens, cnt) partials, one bounded groupby merges them,
    and the driver takes each source's order statistics off its
    histogram slice with :func:`hist_order_stat` (bit-equal to the SQL
    window's interpolation) — no sort, nothing corpus-sized anywhere.
    NULL sources report under ``""``."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def hist(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        n = (
            pc.count_substring_regex(t, _ALNUM_RE.pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        src = pc.fill_null(batch["source"], "")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        span = int(n.max()) + 1 if n.size else 1
        key = codes * span + n
        uk, cnt = np.unique(key, return_counts=True)
        return pa.Table.from_arrays(
            [
                d.dictionary.take(pa.array(uk // span)),
                pa.array(uk % span, pa.int64()),
                pa.array(cnt.astype(np.int64)),
            ],
            names=["source", "n_tokens", "cnt"],
        )

    h = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])
        .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "n_tokens"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # ≤ #sources × max-doc-length rows, never the corpus
        .sort_values(["source", "n_tokens"])
    )
    out: dict = {"source": [], "n_docs": []}
    qnames = [f"q{int(q * 100)}" for q in quantiles]
    for name in qnames:
        out[name] = []
    for src, grp in h.groupby("source", sort=True):
        vals = grp["n_tokens"].to_numpy().astype(np.int64)
        ccum = np.cumsum(grp["cnt"].to_numpy().astype(np.int64))
        out["source"].append(src)
        out["n_docs"].append(int(ccum[-1]))
        for name, q in zip(qnames, quantiles):
            out[name].append(hist_order_stat(vals, ccum, q))
    return pa.Table.from_pydict(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            **{n: pa.array(out[n], pa.float64()) for n in qnames},
        }
    )


def quality_percentile(sf_dir: str):
    """Percentile-rank normalization of the composite quality score —
    the form a corpus-relative quality floor actually wants ("drop the
    bottom 20%" is stable across corpora; a raw-score threshold is
    not). Output: (doc_id, quality_score, pct_rank) with SQL
    ``percent_rank()`` semantics: (rank − 1)/(N − 1), ties sharing the
    minimum rank, rounded to 6.

    Exact without a global sort: quality scores are already 6-decimal
    fixed point, so each batch reduces to a (score·10⁶ → count)
    histogram partial, one bounded groupby merges them, the driver
    reads back only the histogram (≤10⁶+1 rows by construction) and
    broadcasts the cumulative strictly-less counts; a second streaming
    pass maps each row through one ``searchsorted``. The rank division
    uses the same integer operands as the SQL window, so the doubles
    are bit-identical."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def score_only(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        return q.select(["doc_id", "quality_score"])

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # materialize the tiny (doc_id, float64) projection so the second
    # pass does not re-run quality_batch over the whole corpus
    scored = ds.map_batches(
        score_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def hist(batch: pa.Table) -> pa.Table:
        keys = np.round(
            batch["quality_score"].to_numpy() * 1e6
        ).astype(np.int64)
        vals, cnts = np.unique(keys, return_counts=True)
        return pa.Table.from_pydict({"key": vals, "cnt": cnts.astype(np.int64)})

    h = (
        scored.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("key")
    )
    keys = h["key"].to_numpy().astype(np.int64)
    cnts = h["cnt"].to_numpy().astype(np.int64)
    less = np.concatenate([[0], np.cumsum(cnts)[:-1]])  # strictly-less counts
    n_total = int(cnts.sum())

    def rank(batch: pa.Table) -> pa.Table:
        k = np.round(batch["quality_score"].to_numpy() * 1e6).astype(np.int64)
        cl = less[np.searchsorted(keys, k)]
        if n_total > 1:
            pr = round_half_up(cl.astype(np.float64) / float(n_total - 1), 6)
        else:
            pr = np.zeros(k.size, np.float64)
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["quality_score"], pa.array(pr, pa.float64())],
            names=["doc_id", "quality_score", "pct_rank"],
        )

    return scored.map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_keywords(sf_dir: str, k: int = 5):
    """Per-document keyword extraction: the top-``k`` terms of each doc
    by ``tfidf = tf · ln(N/df)``, ties broken by term ascending.
    Output: (doc_id, term, tf, tfidf).

    Two passes, one shuffle: (1) per-batch distinct (doc, term) counts
    collapse to (term, df_partial) rows — never raw tokens — then one
    ``groupby(term).sum``; the df table is broadcast once (``ray.put``;
    vocabulary-sized — the :func:`unigram_logprob` broadcast contract,
    same documented sketch fallback at 100 TB). (2) each batch computes
    its docs' tf vectors (documents never straddle batches), scores
    them against the broadcast idf and takes the per-doc top-k with a
    single lexsort over (doc, −tfidf, term-rank) — no per-row Python,
    no second shuffle. ``N`` is the parquet-metadata row count.

    The ranking uses the UNROUNDED tfidf exactly as the SQL twin's
    ``row_number()`` does; equal (tf, df) pairs produce bit-identical
    scores on both sides, so the term tie-break is deterministic.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = float(ds.count())

    def partial_df(batch: pa.Table) -> pa.Table:
        from ..stages.tokenize import kept_token_codes

        uniq, codes, doc_of, n = kept_token_codes(batch["text"])
        v = max(1, len(uniq))
        pairs = np.unique(doc_of * v + codes)
        pcodes, pdf = np.unique(pairs % v, return_counts=True)
        return pa.Table.from_pydict(
            {
                "term": pa.array([uniq[c] for c in pcodes], pa.string()),
                "df": pdf.astype(np.int64),
            }
        )

    df_tab = (
        ds.map_batches(partial_df, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    terms_arr = pa.array(df_tab["term"].to_numpy(), pa.string())
    idf = np.log(n_docs / df_tab["df"].to_numpy().astype(np.float64))
    ref = ray.put((terms_arr, idf))

    def topk(batch: pa.Table) -> pa.Table:
        from ..stages.tokenize import kept_token_codes

        terms, idf_v = ray.get(ref)
        uniq, codes, doc_of, n = kept_token_codes(batch["text"])
        v = max(1, len(uniq))
        pkeys, tf = np.unique(doc_of * v + codes, return_counts=True)
        row_doc, row_code = pkeys // v, pkeys % v
        uniq_arr = pa.array(uniq, pa.string())
        # '' (doc-boundary artifact) is in the batch vocab but never in
        # the df table; its rows were dropped by `keep`, so any slot
        # index works — fill the null lookup with 0
        code_idf = idf_v[
            pc.fill_null(pc.index_in(uniq_arr, value_set=terms), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        ]
        tfidf = tf.astype(np.float64) * code_idf[row_code]
        # rank of each batch-vocab code in term-ascending order
        term_rank = np.empty(v, np.int64)
        term_rank[np.argsort(np.asarray(uniq, object), kind="stable")] = (
            np.arange(v)
        )
        order = np.lexsort((term_rank[row_code], -tfidf, row_doc))
        sd = row_doc[order]
        seg_start = np.zeros(sd.size, np.int64)
        if sd.size:
            new = np.empty(sd.size, bool)
            new[0] = True
            new[1:] = sd[1:] != sd[:-1]
            starts = np.flatnonzero(new)
            seg_start = starts[np.cumsum(new) - 1]
        pos = np.arange(sd.size) - seg_start
        sel = order[pos < k]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].take(pa.array(row_doc[sel])),
                "term": uniq_arr.take(pa.array(row_code[sel])),
                "tf": tf[sel].astype(np.int64),
                "tfidf": round_half_up(tfidf[sel], 6),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)
