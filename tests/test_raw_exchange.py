"""The raw static-domain exchange (index_build.build_partition,
exchange="raw") must produce BYTE-identical index content to the
Dataset groupby(gkey) path (exchange="dataset"): same segment files,
same doc_stats, same meta. SegmentWriter's global (term, doc) sort
makes its output input-order-independent, and the raw path concatenates
chunk slices in deterministic submission order — this test pins that
contract."""

import hashlib
import os

import pytest

from themis_search_engine_ray.pipelines.index_build import BuildConfig, build_index
from themis_search_engine_ray.sources.transcripts import write_synthetic


def _tree_hashes(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            if rel.startswith(("manifest", "term_stats")) or f == "meta.json":
                # manifests carry wall-time metrics; term_stats is a
                # Ray write_parquet dir (nondeterministic file names),
                # its content is covered by index-conformance tests
                continue
            with open(p, "rb") as fh:
                out[rel] = hashlib.md5(fh.read()).hexdigest()
    return out


@pytest.mark.parametrize("parts,salt_bits,term_parts", [(1, 2, 2), (3, 1, 3)])
def test_raw_vs_dataset_identical(ray_session, tmp_path, parts, salt_bits, term_parts):
    corpus = str(tmp_path / "turns")
    write_synthetic(corpus, n_turns=600, seed=33, turns_per_block=97)
    common = dict(
        num_partitions=parts,
        salt_bits=salt_bits,
        term_parts=term_parts,
        batch_size=128,
        read_chunk_rows=200,
        store_text=True,
        with_role=True,
    )
    m_raw = build_index(
        corpus, str(tmp_path / "raw"), BuildConfig(exchange="raw", **common)
    )
    m_ds = build_index(
        corpus, str(tmp_path / "ds"), BuildConfig(exchange="dataset", **common)
    )
    assert m_raw["n_docs"] == m_ds["n_docs"]
    assert m_raw["n_postings"] == m_ds["n_postings"]
    assert m_raw["avgdl"] == m_ds["avgdl"]
    h_raw = _tree_hashes(str(tmp_path / "raw"))
    h_ds = _tree_hashes(str(tmp_path / "ds"))
    assert h_raw.keys() == h_ds.keys()
    diff = [k for k in h_raw if h_raw[k] != h_ds[k]]
    assert not diff, f"byte-diff in {diff}"
