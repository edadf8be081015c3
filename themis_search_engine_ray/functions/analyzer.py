"""Text analysis chain with Themis-reference conformance.

Reimplements, as pure Python functions (no Ray), the lexical pipeline of
the reference engine (paths into /root/reference, Java root abbreviated
``themis/`` = ``src/main/java/gr/csd/uoc/hy463/themis/``):

* normalizer  — ``replaceAll("[^a-zA-Z0-9]", " ").toLowerCase()``
  (``themis/indexer/Indexer.java:307-364``, query side
  ``themis/ui/Search.java:71,106``). The second regex the reference
  sometimes chains (``[^\\p{L}\\p{Nd}\\p{Nl}]+``) is a no-op after the
  first, so the effective tokenizer is lowercased ``[a-z0-9]+`` runs.
* tokenizer   — whitespace ``StringTokenizer`` → ``str.split()``.
* stopwords   — 320-word set from ``stopwords.txt`` (shipped verbatim),
  checked on the *raw lowercased token before stemming*; a stopword never
  enters the count map (``Indexer.java:202-219``,
  ``themis/lexicalAnalysis/stemmer/StopWords.java:95-99``).
* stemming    — Porter via :mod:`.porter` (``Stemmer.java:47-73``).
* per-doc stats — the build-side quirks of ``Indexer.java:374-418``:

  - ``dl`` (document length) = total count of non-stopword raw tokens
    (``str_length``, ``Indexer.java:381,397``);
  - ``max_fieldfreq`` starts at **1.0** and is the max over per-stem
    accumulated counts (``Indexer.java:287,402-405``);
  - the stored tf of a stem is its count divided by ``max_fieldfreq``
    **once per distinct raw term mapping to that stem**
    (``Indexer.java:410-418`` iterates raw keys and divides each time),
    i.e. sequential divisions — replicated bit-for-bit here.

Positions are an extension over the reference (its postings carry no
positions — ``themis/indexer/indexes/Index.java:106-110``): position =
0-based index of the token in the normalized token stream *including*
stopword slots, so phrase distances survive stopword removal. Positions
never influence BM25 scoring, so oracle parity is unaffected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from importlib import resources

from .porter import stem_token

_NORM_RE = re.compile(r"[^a-zA-Z0-9]+")


def _load_stopwords() -> frozenset[str]:
    text = (
        resources.files("themis_search_engine_ray.functions")
        .joinpath("stopwords.txt")
        .read_text(encoding="utf-8")
    )
    return frozenset(tok.lower() for tok in text.split())


STOPWORDS: frozenset[str] = _load_stopwords()

# boolean operator words (StopWords.isOpWord, StopWords.java:108-115).
# The reference recognizes these but never calls the recognizer — it is
# dead code there; mirrored here for surface parity so a future boolean
# query parser has the same primitive.
_OP_WORDS = frozenset({"and", "or", "not"})


def is_op_word(word: str) -> bool:
    """Case-insensitive membership in {and, or, not} — the reference's
    ``StopWords.isOpWord`` (StopWords.java:108-115), byte-for-byte
    semantics (compareToIgnoreCase against the three literals)."""
    return word.lower() in _OP_WORDS


@dataclass(frozen=True)
class AnalyzerConfig:
    """Honors the reference's config toggles for real (``themis.config:1-32``,
    read-but-ignored in the reference's ``index()`` — see SURVEY §2.11)."""

    use_stemmer: bool = True
    use_stopwords: bool = True

    @property
    def fingerprint(self) -> str:
        return f"stem={int(self.use_stemmer)};stop={int(self.use_stopwords)};norm=alnum-lower;v=1"


DEFAULT_CONFIG = AnalyzerConfig()


def normalize(text: str) -> str:
    """``[^a-zA-Z0-9]`` → space, lowercase (Indexer.java:307)."""
    return _NORM_RE.sub(" ", text).lower()


def tokenize(text: str) -> list[str]:
    """Normalized whitespace tokens (M1+M2)."""
    return normalize(text).split()


@dataclass
class DocTerms:
    """Per-document analysis result (the unit flowing into the index)."""

    tfs: dict[str, float]  # stem -> stored (max-normalized) tf
    counts: dict[str, int]  # stem -> raw occurrence count
    positions: dict[str, list[int]]  # stem -> ascending token positions
    dl: int  # non-stopword token count (BM25 doc length)
    max_tf: float  # max_fieldfreq used for normalization


# Plain-dict stem memo: the build calls the stemmer once per (doc, raw
# term) — tens of millions of calls whose lru_cache wrapper overhead
# (~1.2 µs/hit, profiled at ~10% of the whole build) dwarfs a dict get.
# Bounded so an adversarial vocabulary can't grow worker heaps.
_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 1 << 21


def analyze_doc(text: str, config: AnalyzerConfig = DEFAULT_CONFIG) -> DocTerms:
    """Analyze one document exactly like the reference build loop.

    Mirrors Indexer.java:286-418 for a single-field document (our corpus
    has one text field per turn, vs the reference's title/abstract/...).
    """
    return analyze_tokens(tokenize(text), config)


def analyze_tokens(toks: list[str], config: AnalyzerConfig = DEFAULT_CONFIG) -> DocTerms:
    """analyze_doc over pre-normalized tokens (``tokenize(text)``) — the
    build batch-normalizes whole Arrow columns with C++ kernels (see
    stages.tokenize.normalize_column) and feeds the split tokens here."""
    use_stop = config.use_stopwords
    use_stem = config.use_stemmer

    # Return_Words_Map (Indexer.java:202-219): count raw tokens; a token
    # absent from the map is only inserted if it is not a stopword.
    counts: dict[str, int] = {}
    raw_positions: dict[str, list[int]] = {}
    for pos, t in enumerate(toks):
        if t in counts:
            counts[t] += 1
            raw_positions[t].append(pos)
        elif not (use_stop and t in STOPWORDS):
            counts[t] = 1
            raw_positions[t] = [pos]

    # Stem-merge (Indexer.java:374-406): accumulate per-stem counts, track
    # dl and the number of raw terms feeding each stem.
    stem_counts: dict[str, int] = {}
    stem_rawn: dict[str, int] = {}
    stem_positions: dict[str, list[int]] = {}
    stem_cache = _STEM_CACHE
    dl = 0
    for t, c in counts.items():
        if use_stem:
            s = stem_cache.get(t)
            if s is None:
                s = stem_token(t)
                if len(stem_cache) < _STEM_CACHE_MAX:
                    stem_cache[t] = s
        else:
            s = t
        dl += c
        if s in stem_counts:
            stem_counts[s] += c
            stem_rawn[s] += 1
            stem_positions[s].extend(raw_positions[t])
        else:
            stem_counts[s] = c
            stem_rawn[s] = 1
            stem_positions[s] = list(raw_positions[t])

    # max_fieldfreq starts at 1 (Indexer.java:287) and samples the running
    # accumulated per-stem count, whose max equals the max final count.
    max_tf = 1.0
    for c in stem_counts.values():
        if c > max_tf:
            max_tf = float(c)

    # TF normalization (Indexer.java:410-418): the loop iterates *raw*
    # terms, so a stem fed by r raw terms is divided by max_fieldfreq r
    # times. Replicate as sequential float divisions for bit-identity.
    tfs: dict[str, float] = {}
    for s, c in stem_counts.items():
        tf = float(c)
        for _ in range(stem_rawn[s]):
            tf /= max_tf
        tfs[s] = tf

    for plist in stem_positions.values():
        plist.sort()
    return DocTerms(tfs=tfs, counts=stem_counts, positions=stem_positions, dl=dl, max_tf=max_tf)


def analyze_query(query: str, config: AnalyzerConfig = DEFAULT_CONFIG) -> list[str]:
    """Query analyzer (``Search.java:251-280``, BM25 path).

    normalize → tokenize → stopword-drop (raw token) → stem → dedupe to
    unique stems. The reference emits QueryTerms in nondeterministic
    HashMap order with a tf/maxfreq weight that BM25 then ignores
    (OkapiBM25.java:96-141 reads only the term); we return the unique
    stems in ascending sorted order — the canonical order both the engine
    and the oracle use for floating-point score accumulation.
    """
    seen: dict[str, int] = {}
    for t in tokenize(query):
        if config.use_stopwords and t in STOPWORDS:
            continue
        s = stem_token(t) if config.use_stemmer else t
        seen[s] = seen.get(s, 0) + 1
    return sorted(seen)


def analyze_phrase_query(
    query: str, config: AnalyzerConfig = DEFAULT_CONFIG
) -> list[tuple[str, int]]:
    """Phrase-query analyzer: (stem, token-offset) pairs in query order.

    Offsets index the normalized token stream INCLUDING stopword slots —
    matching how document positions are recorded — so a phrase like
    "state of the art" constrains stem('state') at p and stem('art') at
    p+3 in the document, surviving stopword removal."""
    out = []
    for off, t in enumerate(tokenize(query)):
        if config.use_stopwords and t in STOPWORDS:
            continue
        out.append((stem_token(t) if config.use_stemmer else t, off))
    return out


def analyze_query_weighted(
    query: str, config: AnalyzerConfig = DEFAULT_CONFIG
) -> dict[str, float]:
    """VSM query analyzer (``Search.java:169-199``): stopword-drop on the
    raw token, stem, count per *stem*, then weight = count / maxfreq with
    maxfreq starting at 1 (Search.java:172-198). Returns stem → qtf
    weight; callers iterate in ascending stem order (sorted(dict))."""
    counts: dict[str, float] = {}
    maxfreq = 1.0
    for t in tokenize(query):
        if config.use_stopwords and t in STOPWORDS:
            continue
        s = stem_token(t) if config.use_stemmer else t
        if s in counts:
            counts[s] += 1.0
            if counts[s] > maxfreq:
                maxfreq = counts[s]
        else:
            counts[s] = 1.0
    return {s: c / maxfreq for s, c in counts.items()}
