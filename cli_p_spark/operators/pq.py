"""Product-quantization (PQ) preselect: linking when the index is too big
to broadcast even in f16.

PQ (Jégou et al., TPAMI'11 — the same family faiss couples with IVF in
IndexIVFPQ) compresses each d-dim vector into M uint8 codes: split the
dimension into M subspaces, k-means 256 centroids per subspace, store the
per-subspace code.  At 512-d with M=32 the index shrinks 64x
(10^7 x 512 x 4B = 20 GB -> 320 MB of codes + 1 MB of codebooks), which
broadcasts comfortably.

Search is asymmetric distance: a query builds an [M, 256] lookup table of
subspace dot products, and a candidate's approximate score is the sum of
M table lookups — no FLOPs against the index matrix at all.  The top-kc
preselected candidates are then rescored EXACTLY against the full-precision
entity table via an equi-join (the vectors never need to be broadcast),
so final ranking quality is bounded by preselect recall, not PQ error.

Plan shape:

    mentions --mapInPandas PQ preselect--> (mention, candidate entity ids)
             --join entity table on entity_id-->  exact cosine (zip_with)
             --per-mention top-k window--> links

Two shuffles (candidate join + window), both on id-width rows.  The
crossover vs the dense GEMM broadcast: PQ wins once E x dim x 4B
outgrows executor memory; below that the sgemm path is faster (BLAS beats
gather-sums).  Measured on fixtures in tests/test_pq.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import NORM_EPS, SEED
from .link import _entity_arrays, cosine_expr
from .topk import topk_per_group


def train_pq(
    X: np.ndarray, m_subspaces: int = 8, n_codes: int = 256,
    iters: int = 10, seed: int = SEED, max_train: int = 50_000,
) -> np.ndarray:
    """Codebooks [M, n_codes, d/M] via per-subspace k-means (seeded,
    deterministic, sample-trained — the reference's train-once device)."""
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    assert d % m_subspaces == 0, "dim must divide into subspaces"
    dsub = d // m_subspaces
    rng = np.random.default_rng(seed ^ 0x91)
    if n > max_train:
        X = X[rng.choice(n, max_train, replace=False)]
        n = max_train
    k = min(n_codes, n)
    books = np.zeros((m_subspaces, n_codes, dsub))
    for m in range(m_subspaces):
        S = X[:, m * dsub:(m + 1) * dsub]
        C = S[rng.choice(n, k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d2, axis=1)
            for j in range(k):
                members = S[a == j]
                if len(members):
                    C[j] = members.mean(axis=0)
                else:
                    C[j] = S[rng.integers(n)]
        books[m, :k] = C
    return books


def pq_encode(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """codes [n, M] uint8: nearest subspace centroid per block."""
    X = np.asarray(X, dtype=np.float64)
    M, n_codes, dsub = books.shape
    out = np.empty((len(X), M), dtype=np.uint8)
    for m in range(M):
        S = X[:, m * dsub:(m + 1) * dsub]
        d2 = ((S[:, None, :] - books[m][None, :, :]) ** 2).sum(-1)
        out[:, m] = np.argmin(d2, axis=1).astype(np.uint8)
    return out


def pq_scores(Q: np.ndarray, books: np.ndarray, codes: np.ndarray
              ) -> np.ndarray:
    """Approximate inner products [n_q, E] via LUT gathers (asymmetric
    distance computation)."""
    M, n_codes, dsub = books.shape
    nq = len(Q)
    # LUT[q, m, c] = <Q_sub, book_c>
    lut = np.einsum(
        "qmd,mcd->qmc",
        Q.reshape(nq, M, dsub),
        books,
    )
    scores = np.zeros((nq, len(codes)))
    for m in range(M):
        scores += lut[:, m, :][:, codes[:, m].astype(np.int64)]
    return scores


def link_pq(
    mentions: DataFrame,
    entities: DataFrame,
    entities_pdf: pd.DataFrame,
    books: np.ndarray,
    k: int = 1,
    tau: float = 0.0,
    kc: int = 32,
    mention_keys: tuple[str, ...] = ("doc_id", "span_idx"),
    carry_cols: tuple[str, ...] = ("kind",),
) -> DataFrame:
    """PQ preselect (broadcast codes) + exact rescore (entity-table join).

    ``entities_pdf`` is used only to BUILD codes here (in production the
    codes table is built once by a separate job, like save_index); the
    full-precision vectors are read from the ``entities`` DataFrame at
    rescore time and are never broadcast.
    """
    spark = mentions.sparkSession
    eids, emat = _entity_arrays(entities_pdf)
    codes = pq_encode(emat, books)
    bc = spark.sparkContext.broadcast((eids, codes, books))

    keys = list(mention_keys)
    ment = mentions.filter(F.col("embedding").isNotNull())
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in ment.schema.fields if f.name in keys
    )

    def preselect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        eids_b, codes_b, books_b = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            scores = pq_scores(Q, books_b, codes_b)
            ncand = min(kc, scores.shape[1])
            cand = np.argpartition(-scores, ncand - 1, axis=1)[:, :ncand]
            out = pdf[keys].iloc[
                np.repeat(np.arange(len(pdf)), ncand)
            ].reset_index(drop=True)
            out["entity_id"] = eids_b[cand.ravel()]
            yield out

    cands = ment.select(*keys, "embedding").mapInPandas(
        preselect, schema=f"{key_schema}, entity_id string"
    )
    m_emb = ment.select(*keys, *carry_cols, F.col("embedding").alias("m_emb"))
    e_emb = entities.select("entity_id", F.col("embedding").alias("e_emb"))
    scored = (
        cands.join(m_emb, keys)
        .join(e_emb, "entity_id")
        .withColumn("score", cosine_expr("m_emb", "e_emb"))
        .drop("m_emb", "e_emb")
    )
    top = topk_per_group(
        scored, group_cols=keys, order_col="score", k=k,
        tiebreak_cols=["entity_id"],
    )
    return top.filter(F.col("score") >= tau)
