"""S4 graph-entry parser + S12 graph storage: reference-quirk parsing
(S2JsonEntryReader.java:162-209), Parquet round-trip, and the revived
link-analysis path (entries -> edges -> PageRank)."""

import json

import numpy as np
import pytest

from themis_search_engine_ray.sources.citations import (
    _parse_entry,
    citation_edges,
    id64,
    load_graph,
    pagerank_citations,
    read_graph_entries,
    save_graph,
)

A = "a" * 40
B = "b" * 40
C = "c" * 40


def _jsonl(tmp_path, lines):
    p = tmp_path / "entries.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_parse_entry_reference_quirks():
    # authors' id strings are FLATTENED into one list (the reference's
    # per-author inner list is dead code)
    i, auth, cits, bad = _parse_entry(
        json.dumps(
            {
                "id": A,
                "authors": [
                    {"name": "x", "ids": ["1", "2"]},
                    {"name": "y"},  # missing ids -> contributes nothing
                    {"name": "z", "ids": ["3"]},
                ],
                "outCitations": [B, C],
            }
        )
    )
    assert (i, auth, cits, bad) == (A, ["1", "2", "3"], [B, C], 0)

    # missing arrays default to empty (reference null checks)
    assert _parse_entry(json.dumps({"id": A})) == (A, [], [], 0)

    # unparseable line -> blank entry, counted malformed (the reference
    # logs the ParseException and returns the empty object)
    assert _parse_entry("{nope") == ("", [], [], 1)
    assert _parse_entry("[1, 2]") == ("", [], [], 1)

    # wrong-typed fields in VALID JSON also blank the entry (Java's
    # getJSONArray/getJSONObject throw -> logged-and-blank), never
    # crash the task and never iterate a string id char-by-char
    assert _parse_entry(json.dumps({"id": A, "authors": "smith"})) == ("", [], [], 1)
    assert _parse_entry(json.dumps({"id": A, "authors": ["smith"]})) == ("", [], [], 1)
    assert _parse_entry(json.dumps({"id": A, "authors": [{"ids": "12"}]})) == (
        "", [], [], 1)
    assert _parse_entry(json.dumps({"id": A, "outCitations": "x"})) == ("", [], [], 1)
    assert _parse_entry(json.dumps({"id": {"a": 1}})) == ("", [], [], 1)
    # null author entries are skipped, not fatal
    assert _parse_entry(json.dumps({"id": A, "authors": [None]})) == (A, [], [], 0)
    # integer ids coerce like Java string coercion
    assert _parse_entry(json.dumps({"id": A, "authors": [{"ids": [12]}]})) == (
        A, ["12"], [], 0)


def test_read_entries_and_edges(ray_session, tmp_path):
    path = _jsonl(
        tmp_path,
        [
            json.dumps({"id": A, "outCitations": [B, C]}),
            json.dumps({"id": B, "outCitations": [C]}),
            json.dumps({"id": C}),  # no citations -> no edges
            "not json at all",  # malformed -> empty entry, no edges
        ],
    )
    entries = read_graph_entries(path).to_pandas()
    assert len(entries) == 4
    assert int(entries["malformed"].sum()) == 1

    edges = citation_edges(read_graph_entries(path)).to_pandas()
    got = {(s, d) for s, d in zip(edges["src"], edges["dst"])}
    assert got == {(A, B), (A, C), (B, C)}
    # int64 keys are the deterministic top-16-hex mapping
    assert set(edges["src64"]) <= {id64(A), id64(B)}
    assert id64(A) == int(np.uint64(int(A[:16], 16)).astype(np.int64))
    assert id64("not-hex!") == id64("not-hex!")  # stable fallback


def test_graph_roundtrip(ray_session, tmp_path):
    path = _jsonl(
        tmp_path,
        [json.dumps({"id": A, "outCitations": [B]}), json.dumps({"id": B, "outCitations": [A]})],
    )
    edges = citation_edges(read_graph_entries(path))
    out = str(tmp_path / "graph")
    manifest = save_graph(edges, out)
    assert manifest["n_edges"] == 2

    loaded = load_graph(out).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    orig = edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert loaded.equals(orig)

    with pytest.raises(ValueError):
        (tmp_path / "graph" / "manifest.json").write_text(
            json.dumps({"format": "other"})
        )
        load_graph(out)


def test_pagerank_citations_matches_numpy(ray_session, tmp_path):
    # 4-node graph incl. a dangling node (D cites nothing)
    D = "d" * 40
    path = _jsonl(
        tmp_path,
        [
            json.dumps({"id": A, "outCitations": [B, C]}),
            json.dumps({"id": B, "outCitations": [C]}),
            json.dumps({"id": C, "outCitations": [A, D]}),
        ],
    )
    got = pagerank_citations(path, n_iter=12).to_pandas()
    ranks = dict(zip(got["node"], got["rank"]))

    # numpy reference power iteration with dangling redistribution
    nodes = [id64(x) for x in (A, B, C, D)]
    idx = {n: i for i, n in enumerate(nodes)}
    out = {idx[id64(A)]: [idx[id64(B)], idx[id64(C)]],
           idx[id64(B)]: [idx[id64(C)]],
           idx[id64(C)]: [idx[id64(A)], idx[id64(D)]]}
    r = np.full(4, 0.25)
    for _ in range(12):
        nxt = np.full(4, 0.15 / 4)
        dangling = sum(r[i] for i in range(4) if i not in out)
        nxt += 0.85 * dangling / 4
        for s, ds in out.items():
            for d in ds:
                nxt[d] += 0.85 * r[s] / len(ds)
        r = nxt
    for n, i in idx.items():
        assert ranks[n] == pytest.approx(r[i], rel=1e-9)
    assert sum(ranks.values()) == pytest.approx(1.0, rel=1e-6)


def test_corpus_semi_join_drops_phantom_targets(ray_session, tmp_path):
    """J4 (PageRank.java:98-105): citations whose target is not itself
    a corpus entry are dropped with corpus_only=True; the round-3
    rank-everything behavior is preserved with the default False."""
    P = "f" * 40  # phantom: cited but never an entry
    path = _jsonl(
        tmp_path,
        [
            json.dumps({"id": A, "outCitations": [B, P]}),
            json.dumps({"id": B, "outCitations": [A, C, P]}),
            json.dumps({"id": C}),
        ],
    )
    from themis_search_engine_ray.sources.citations import corpus_id64s, read_graph_entries

    entries = read_graph_entries(path).materialize()
    corpus = corpus_id64s(entries)
    assert set(corpus.tolist()) == {id64(A), id64(B), id64(C)}

    filtered = citation_edges(entries, corpus_ids=corpus).to_pandas()
    got = {(s, d) for s, d in zip(filtered["src"], filtered["dst"])}
    assert got == {(A, B), (B, A), (B, C)}  # both P-edges dropped

    unfiltered = citation_edges(entries).to_pandas()
    assert {(s, d) for s, d in zip(unfiltered["src"], unfiltered["dst"])} == {
        (A, B), (A, P), (B, A), (B, C), (B, P)
    }

    # the filtered pagerank ranks only corpus nodes
    ranked = pagerank_citations(path, n_iter=4, corpus_only=True).to_pandas()
    assert set(ranked["node"]) == {id64(A), id64(B), id64(C)}
    ranked_all = pagerank_citations(path, n_iter=4).to_pandas()
    assert id64(P) in set(ranked_all["node"])


def test_pagerank_citations_table_matches_numpy(ray_session):
    """The full synthetic-citations driver pipeline (S4 parse → J4
    semi-join → directed PageRank) against a numpy power iteration over
    the same deterministically derived edge set."""
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.graph import pagerank_citations_table

    sf = "/root/testdata/sf0.001"
    got = pagerank_citations_table(sf, n_iter=6).to_pandas()
    ranks = dict(zip(got["doc_id"], got["rank"]))

    ids = sorted(
        int(i)
        for i in pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_pylist()
    )
    idset = set(ids)
    edges = []
    for d in ids:
        for t in (d + 1, d * 3):
            if t in idset:  # the J4 semi-join
                edges.append((d, t))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for s, t in edges:
        out.setdefault(idx[s], []).append(idx[t])
    r = np.full(n, 1.0 / n)
    for _ in range(6):
        nxt = np.full(n, 0.15 / n)
        dangling = sum(r[i] for i in range(n) if i not in out)
        nxt += 0.85 * dangling / n
        for s, ds in out.items():
            for d in ds:
                nxt[d] += 0.85 * r[s] / len(ds)
        r = nxt
    assert set(ranks) == set(nodes)
    for node, i in idx.items():
        assert ranks[node] == pytest.approx(r[i], abs=5e-7)
