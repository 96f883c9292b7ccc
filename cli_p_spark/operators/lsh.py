"""Banded random-hyperplane LSH for high-similarity embedding pairs.

Candidate-generation complexity is the whole game for canonicalization at
10^12 mentions: the IVF probe structure (operators/ann.py) prunes a
top-k SEARCH well, but for ALL-PAIRS-above-tau it only cuts the quadratic
candidate space by ~nlist/nprobe (3x at the reference's defaults) — still
O(n^2).  Sign-LSH banding is the right tool once tau is high: with
bits_per_band=16, two random vectors (cos~0) collide in a band with
p = 2^-16, so a 16-band scheme generates ~n^2 * 2.4e-4 candidates, while
a cos=0.95 pair collides with p ~ 0.96 and an exact duplicate always
collides.  (Charikar'02 SimHash family; the banding trick is the classic
MinHash-LSH layout, cf. operators/dedup.py for the token version.)

Pipeline shape (all DataFrame ops):

    embeddings -> sign bits (seeded hyperplanes, pandas UDF)
               -> band keys (bit-packed ints) -> explode
               -> self-join on (band, key)  [the only shuffle]
               -> exact cosine verify (zip_with, JVM) -> pairs >= tau

Determinism: hyperplanes from the config seed; candidate set is a pure
function of the embeddings.  Recall at tau: 1-(1-p_band)^bands with
p_band = (1 - theta/pi)^bits — tune bands upward for lower tau (at
tau<0.8 prefer the IVF search path; LSH recall decays fast below that).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import SEED
from .link import cosine_expr


def hyperplane_lsh_pairs(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    tau: float,
    dim: int,
    bits_per_band: int = 16,
    bands: int = 16,
    seed: int = SEED,
    max_bucket: int = 2000,
    group_col: str | None = None,
) -> DataFrame:
    """(src, dst, cosine) pairs with cosine >= tau, src < dst.

    ``max_bucket`` guards degenerate buckets (mass-duplicate content):
    larger buckets are dropped from pairing — route such content through
    exact dedup first (identical embeddings land in identical buckets in
    EVERY band, so a representative-per-exact-dup pre-pass is the scale
    hygiene anyway).

    ``group_col``: restrict pairing to rows sharing this column (the
    SCALE.md stage-3 sharding — e.g. canonicalize per linked entity
    neighborhood at 10^12 mentions, where even sub-quadratic global
    banding is infeasible).  The group simply joins the band key.
    """
    n_planes = bits_per_band * bands
    rng = np.random.default_rng(seed ^ 0x15A9)
    H = rng.standard_normal((dim, n_planes))
    bpb = bits_per_band

    @pandas_udf("array<long>")
    def band_keys(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weights = (1 << np.arange(bpb, dtype=np.int64))
        for s in batches:
            M = np.stack(s.to_numpy()).astype(np.float64)
            bits = (M @ H) > 0  # [n, n_planes]
            keys = bits.reshape(len(M), bands, bpb).astype(np.int64) @ weights
            yield pd.Series(list(keys), dtype=object)

    # banding over ids only — embeddings attach AFTER pair dedup, so the
    # candidate shuffle carries 2 ids instead of 2 vectors per row
    gcols = [group_col] if group_col else []
    nodes = df.select(
        F.col(id_col).alias("_id"), F.col(embedding_col).alias("_emb"),
        *gcols,
    )
    sig = nodes.withColumn("_keys", band_keys(F.col("_emb"))).select(
        "_id", *gcols, F.posexplode("_keys").alias("_band", "_key")
    )
    join_keys = gcols + ["_band", "_key"]
    sized = sig.withColumn(
        "_bn", F.count(F.lit(1)).over(Window.partitionBy(*join_keys))
    ).filter(F.col("_bn") <= max_bucket)

    a = sized.select(F.col("_id").alias("src"), *join_keys)
    b = sized.select(F.col("_id").alias("dst"), *join_keys)
    cand = (
        a.join(b, join_keys)
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
    ea = nodes.select(F.col("_id").alias("src"), F.col("_emb").alias("_ea"))
    eb = nodes.select(F.col("_id").alias("dst"), F.col("_emb").alias("_eb"))
    return (
        cand.join(ea, "src").join(eb, "dst")
        .withColumn("cosine", cosine_expr("_ea", "_eb"))
        .filter(F.col("cosine") >= tau)
        .select("src", "dst", "cosine")
    )
