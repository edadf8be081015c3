"""IR evaluation harness: judged queries → AP + nDCG → min/max/avg/mean.

Replicates the reference's de-facto test suite (`/root/reference`,
``themis/metrics/themisEval.java`` driven by ``themis/ui/Search.java``),
quirks preserved:

* **AP** (themisEval.java:116-150): walk the ranked answers; a rank
  counter increments ONLY on judged docs (unjudged answers are skipped
  entirely); on each relevant hit ``found++`` and ``Sum += found/counter``;
  AP = Sum/found — NaN when no relevant doc was retrieved (0/0), exactly
  like the Java double division.
* **nDCG** (themisEval.java:240-270): binary relevance. IDCG sums
  1/log2(j+2) for j in [0, related). DCG walks the answers with a
  counter that increments on every *judged* answer; each relevant one
  adds 1/log2(counter+1) (so gain positions are judged-rank based, the
  reference's quirk) and the walk breaks once the counter reaches the
  number of relevant docs. NaN when related == 0.
* **min/max/avg/mean** (themisEval.java:280-317 ``CalculateValues``):
  min/max initialized from values[0] (a NaN first value freezes them at
  NaN — quirk preserved); sum and count skip NaNs; ``mean`` is the
  midrange (max+min)/2, not a median.

Judgments file format mirrors the TREC Fair Ranking sample the
reference consumes (themisEval.java:58-84): JSON lines with
``qid``, ``query``, ``frequency``, ``documents: [{doc_id, relevance}]``;
doc_id here is ``"{conv_id}:{turn_idx}"``.

Batch evaluation is Ray-Data-native (SURVEY §2.9 RD mapping): queries →
``map_batches(QueryScorer, concurrency=N)`` where each actor holds a
``LocalSearchEngine`` (index mmap'd once per actor in ``__init__``).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass


@dataclass
class JudgedQuery:
    qid: int
    query: str
    frequency: float
    # doc_id ("conv:turn") -> relevance in {0, 1}
    judgments: dict[str, int]


def doc_id_str(conv_id: str, turn_idx: int) -> str:
    return f"{conv_id}:{turn_idx}"


def read_judgments(path: str) -> list[JudgedQuery]:
    """TREC-ish JSON-lines judgments reader (themisEval.java:58-84)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            out.append(
                JudgedQuery(
                    qid=int(obj["qid"]),
                    query=obj["query"],
                    frequency=float(obj.get("frequency", 0.0)),
                    judgments={
                        d["doc_id"]: int(d["relevance"]) for d in obj["documents"]
                    },
                )
            )
    return out


def average_precision(ranked_doc_ids: list[str], judgments: dict[str, int]) -> float:
    """The reference's AP variant (themisEval.java:116-150)."""
    s = 0.0
    found = 0.0
    counter = 0.0
    for did in ranked_doc_ids:
        rel = judgments.get(did)
        if rel == 1:
            found += 1.0
            counter += 1.0
            s += found / counter
        elif rel == 0:
            counter += 1.0
        # unjudged: skipped, counter untouched
    if found == 0.0:
        return float("nan")  # Java 0.0/0.0
    return s / found


def ndcg(ranked_doc_ids: list[str], judgments: dict[str, int]) -> float:
    """The reference's binary nDCG variant (themisEval.java:240-270)."""
    related = sum(1 for r in judgments.values() if r == 1)
    if related == 0:
        return float("nan")
    idcg = 0.0
    for j in range(related):
        idcg += 1.0 / (math.log(j + 2) / math.log(2))
    counter = 0.0
    dcg = 0.0
    for did in ranked_doc_ids:
        rel = judgments.get(did)
        if rel == 1:
            counter += 1.0
            dcg += 1.0 / (math.log(counter + 1) / math.log(2))
            if counter == related:
                break
        elif rel == 0:
            counter += 1.0
    return dcg / idcg


@dataclass
class MetricValues:
    min: float
    max: float
    average: float
    mean: float  # midrange (max+min)/2 — the reference's naming


def metric_values(values: list[float]) -> MetricValues:
    """themisEval.CalculateValues (280-317), NaN handling preserved."""
    if not values:
        return MetricValues(float("nan"), float("nan"), float("nan"), float("nan"))
    vmin = values[0]
    vmax = values[0]
    total = 0.0
    nan_count = 0
    for num in values:
        if not math.isnan(num):
            if num < vmin:
                vmin = num
            elif num > vmax:
                vmax = num
            total += num
        else:
            nan_count += 1
    denom = float(len(values) - nan_count)
    avg = total / denom if denom else float("nan")
    return MetricValues(min=vmin, max=vmax, average=avg, mean=(vmax + vmin) / 2)


class QueryScorer:
    """Actor-pool batch scorer: LocalSearchEngine loaded once per actor
    (T1/T2 state), queries scored per batch (SURVEY §2.9 RD mapping)."""

    def __init__(self, index_dir: str, model: str = "bm25", k: int = 50):
        from ..state.searcher import LocalSearchEngine

        self.engine = LocalSearchEngine(index_dir)
        self.model = model
        self.k = k

    def __call__(self, batch: dict) -> dict:
        import numpy as np

        qids, queries = batch["qid"], batch["query"]
        out_ids: list[list[str]] = []
        for q in queries:
            if self.model == "bm25":
                hits = self.engine.search(q, k=self.k)
            elif self.model == "vsm":
                hits = self.engine.search_vsm(q, k=self.k)
            elif self.model == "existential":
                hits = self.engine.search_existential(q, k=self.k)
            elif self.model == "phrase":
                hits = self.engine.search_phrase(q, k=self.k)
            else:
                raise ValueError(self.model)
            out_ids.append([doc_id_str(h.conv_id, h.turn_idx) for h in hits])
        return {
            "qid": np.asarray(qids),
            "ranked": np.asarray(
                ["\x1f".join(ids) for ids in out_ids], dtype=object
            ),
        }


def evaluate(
    index_dir: str,
    judged: list[JudgedQuery],
    model: str = "bm25",
    k: int = 50,
    concurrency: int = 2,
) -> dict:
    """Batch-evaluate judged queries against the index; returns
    {"per_query": [...], "ap": MetricValues, "ndcg": MetricValues}."""
    import ray.data as rd

    ds = rd.from_items([{"qid": jq.qid, "query": jq.query} for jq in judged])
    res = ds.map_batches(
        QueryScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "model": model, "k": k},
        concurrency=min(concurrency, max(1, len(judged))),
        batch_size=max(1, len(judged) // max(1, concurrency)),
    ).to_pandas()

    by_qid = {jq.qid: jq for jq in judged}
    per_query = []
    aps, ndcgs = [], []
    for qid, ranked in sorted(zip(res["qid"], res["ranked"])):
        jq = by_qid[int(qid)]
        ids = ranked.split("\x1f") if ranked else []
        ap = average_precision(ids, jq.judgments)
        nd = ndcg(ids, jq.judgments)
        aps.append(ap)
        ndcgs.append(nd)
        per_query.append({"qid": int(qid), "ap": ap, "ndcg": nd, "n_results": len(ids)})
    return {
        "per_query": per_query,
        "ap": metric_values(aps),
        "ndcg": metric_values(ndcgs),
        "model": model,
        "k": k,
    }


def write_eval_report(path: str, result: dict) -> None:
    """Metric report file (themisEval.java:323-346 wrote
    ``B3_okapiBM25.idx``-style text; we write the same fields)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for metric in ("ap", "ndcg"):
            mv = result[metric]
            f.write(
                f"{metric} min={mv.min} max={mv.max} "
                f"average={mv.average} mean={mv.mean}\n"
            )
        f.write(f"model={result['model']} k={result['k']} "
                f"queries={len(result['per_query'])}\n")
