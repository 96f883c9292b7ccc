"""NumPy exact oracle — the reference's math, verbatim, no Spark.

Reimplements the reference's search semantics (SURVEY.md §5.1):
L2-normalize with the <1e-9 passthrough (query-index.py:13-17), full
inner-product scan (== faiss IndexFlatIP == IVF at nprobe=nlist,
build-index.py:80-81 + query-index.py:30), argsort top-k descending
(query-index.py:111,114-119), deterministic tie-break on entity_id.

Golden triples: for every span that yields a valid embedding, the rank-1
entity with cosine >= tau becomes
    (subj=doc_id, pred='mentions'|'depicts', obj=entity_id, score, span_idx)
per SURVEY.md §2.3.  The Spark pipeline's P/R is measured against this.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DIM, SEED, TAU
from ..functions.encoder import encode_batch


def span_contents(docs: pd.DataFrame) -> pd.DataFrame:
    """Explode documents into one row per span, order-preserving.

    Columns: doc_id, span_idx, kind, text, media_ref, offset, content
    (content = text for text spans, media_ref for image spans — the two
    query modalities of query-index.py:86-108 folded into one column).
    """
    rows = []
    for r in docs.to_dict("records"):
        for i, s in enumerate(r["spans"]):
            rows.append(
                {
                    "doc_id": r["doc_id"],
                    "span_idx": i,
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": s["offset"],
                    "content": s["text"] if s["kind"] == "text" else s["media_ref"],
                }
            )
    return pd.DataFrame(
        rows,
        columns=["doc_id", "span_idx", "kind", "text", "media_ref", "offset",
                 "content"],
    )


def golden_triples(
    docs: pd.DataFrame,
    entities: pd.DataFrame,
    dim: int = DIM,
    seed: int = SEED,
    tau: float = TAU,
    k: int = 1,
) -> pd.DataFrame:
    """Exact rank-k links.  Returns columns
    (subj, pred, obj, score, span_idx, rank) sorted by (subj, span_idx, rank).
    Skipped (corrupt) spans produce no triple — they land in `skips`."""
    spans = span_contents(docs)
    if spans.empty:
        return pd.DataFrame(
            columns=["subj", "pred", "obj", "score", "span_idx", "rank"]
        )
    mat, ok = encode_batch(spans["content"], dim=dim, seed=seed)
    emat = np.stack(entities["embedding"].to_numpy()).astype(np.float64)
    eids = entities["entity_id"].to_numpy()
    # deterministic secondary sort key: entity_id ascending
    order_eid = np.argsort(eids, kind="stable")
    emat_sorted = emat[order_eid]
    eids_sorted = eids[order_eid]

    scores = mat.astype(np.float64) @ emat_sorted.T  # [n_spans, n_entities]
    out = []
    for i in range(len(spans)):
        if not ok[i]:
            continue
        row = scores[i]
        # stable argsort descending on score; ties broken by entity_id asc
        top = np.argsort(-row, kind="stable")[:k]
        for rank, j in enumerate(top, start=1):
            sc = float(row[j])
            if sc < tau:
                continue
            out.append(
                {
                    "subj": spans["doc_id"].iat[i],
                    "pred": "mentions" if spans["kind"].iat[i] == "text" else "depicts",
                    "obj": str(eids_sorted[j]),
                    "score": sc,
                    "span_idx": int(spans["span_idx"].iat[i]),
                    "rank": rank,
                }
            )
    res = pd.DataFrame(
        out, columns=["subj", "pred", "obj", "score", "span_idx", "rank"]
    )
    return res.sort_values(["subj", "span_idx", "rank"]).reset_index(drop=True)


def precision_recall(
    got: pd.DataFrame, golden: pd.DataFrame
) -> tuple[float, float]:
    """Set P/R on (subj, span_idx, pred, obj) keys (score excluded: ANN may
    find the same link with a float-noise different score)."""
    key = ["subj", "span_idx", "pred", "obj"]
    g = set(map(tuple, golden[key].itertuples(index=False)))
    h = set(map(tuple, got[key].itertuples(index=False)))
    if not h:
        return (0.0, 0.0 if g else 1.0)
    tp = len(g & h)
    return (tp / len(h), tp / len(g) if g else 1.0)
