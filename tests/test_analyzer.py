"""Analyzer conformance unit tests (SURVEY §5.2 item 1).

Golden vectors include the reference's own smoke cases
(Stemmer.java:92-94: ending→end, publications→public;
StopWords.java:119-121: "other" is a stopword, "ending" is not) and
classic tartarus Porter vocabulary pairs.
"""

import math

from themis_search_engine_ray.functions.analyzer import (
    STOPWORDS,
    AnalyzerConfig,
    analyze_doc,
    analyze_query,
    normalize,
    tokenize,
)
from themis_search_engine_ray.functions.bm25 import idf, term_score
from themis_search_engine_ray.functions.porter import porter_stem, stem_token

# (input, expected) — classic Porter (Release 4 / tartarus) behavior.
PORTER_VECTORS = [
    ("ending", "end"),
    ("publications", "public"),
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("disabled", "disabl"),
    ("matting", "mat"),
    ("mating", "mate"),
    ("meeting", "meet"),
    ("milling", "mill"),
    ("messing", "mess"),
    ("meetings", "meet"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("conformabli", "conform"),
    ("radicalli", "radic"),
    ("differentli", "differ"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # short-word guard: length <= 2 unchanged
    ("a", "a"),
    ("is", "is"),
    ("sky", "sky"),
    # digit-leading tokens run through Porter unchanged-ish
    ("2020", "2020"),
    ("90s", "90"),
    ("oed", "o"),  # "ed" stripped in step1; Bug-1 guard only protects steps 3/5
    ("ion", "ion"),
]


def test_porter_vectors():
    for raw, want in PORTER_VECTORS:
        assert porter_stem(raw) == want, (raw, porter_stem(raw), want)


def test_stem_dispatch():
    # Greek range passes through (Stemmer.java:59-64)
    assert stem_token("αλφα") == "αλφα"
    # trim + lower first
    assert stem_token("  Ending ") == "end"
    assert stem_token("") == ""


def test_stopwords_reference_cases():
    assert "other" in STOPWORDS
    assert "ending" not in STOPWORDS
    # 412 whitespace-separated words in the reference's stopwords.txt
    # (SURVEY §2.2 says "320-word set"; the actual resource holds 412).
    assert len(STOPWORDS) == 412


def test_normalize_tokenize():
    # runs of bad chars collapse to one space; the resulting *token stream*
    # equals the reference's char-by-char replacement + StringTokenizer.
    assert normalize("State-of-the-art, C++!") == "state of the art c "
    assert tokenize("End2End x=42 (quoted)") == ["end2end", "x", "42", "quoted"]
    assert tokenize("αλφα βητα") == []  # non-ASCII stripped by [^a-zA-Z0-9]
    assert tokenize("") == []


def test_analyze_doc_counts_and_dl():
    # "the" is a stopword: dropped and not counted in dl.
    doc = analyze_doc("the cat sat on the mat with the cat")
    # raw counts: cat=2, sat=1, mat=1 ("on","the","with" are stopwords)
    assert doc.dl == 4
    assert doc.counts == {"cat": 2, "sat": 1, "mat": 1}
    assert doc.max_tf == 2.0
    assert doc.tfs["cat"] == 1.0
    assert doc.tfs["sat"] == 0.5


def test_analyze_doc_stem_collision_double_division():
    # "mate" and "mating" both stem to "mate": counts merge (2), but the
    # normalization divides once per raw term -> tf = 2 / max^2
    # (Indexer.java:410-418 quirk).
    doc = analyze_doc("mate mating rock rock rock")
    assert doc.counts["mate"] == 2
    assert doc.max_tf == 3.0
    assert doc.tfs["mate"] == (2.0 / 3.0) / 3.0
    assert doc.tfs["rock"] == 1.0
    assert doc.dl == 5


def test_analyze_doc_positions():
    doc = analyze_doc("alpha the beta alpha")
    # positions index the full token stream (stopword slots included)
    assert doc.positions["alpha"] == [0, 3]
    assert doc.positions["beta"] == [2]


def test_analyze_doc_empty_and_stopword_only():
    assert analyze_doc("").dl == 0
    only_stop = analyze_doc("the and of")
    assert only_stop.dl == 0
    assert only_stop.tfs == {}
    assert only_stop.max_tf == 1.0  # max_fieldfreq floor (Indexer.java:287)


def test_analyzer_toggles():
    cfg = AnalyzerConfig(use_stemmer=False, use_stopwords=False)
    doc = analyze_doc("the cats the", cfg)
    assert doc.counts == {"the": 2, "cats": 1}
    assert doc.dl == 3
    cfg2 = AnalyzerConfig(use_stemmer=False, use_stopwords=True)
    assert analyze_doc("the cats", cfg2).counts == {"cats": 1}


def test_analyze_query():
    # dedupe to unique stems, sorted; stopwords dropped on raw token
    assert analyze_query("Meetings, the meeting! cats") == ["cat", "meet"]
    assert analyze_query("the and of") == []
    assert analyze_query("") == []


def test_bm25_math_closed_form():
    # 5-doc corpus closed-form check (SURVEY §5.2 item 2).
    n, df = 5.0, 2
    want_idf = math.log((5.0 - 2 + 0.5) / 2.5) / math.log(2.0)
    assert idf(n, df) == want_idf
    # negative idf for df > N/2 is kept
    assert idf(5.0, 4) < 0
    s = term_score(1.0, 10, 8.0, want_idf)
    expect = want_idf * (1.0 * 3.0) / (1.0 + 2.0 * (0.25 + 0.75 * (10 / 8.0)))
    assert abs(s - expect) < 1e-15


def test_is_op_word_matches_reference_semantics():
    """StopWords.isOpWord parity (StopWords.java:108-115):
    case-insensitive {and, or, not}, nothing else — notably 'AND' in
    any case, and no overlap assumption with the stopword list."""
    from themis_search_engine_ray.functions.analyzer import is_op_word

    for w in ("and", "AND", "And", "or", "OR", "not", "NoT"):
        assert is_op_word(w)
    for w in ("", "a", "nor", "android", "ort", "the", "knot"):
        assert not is_op_word(w)
