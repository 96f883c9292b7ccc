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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import SEED
from .link import cosine_expr


class _CacheHandle:
    """unpersist() handle bundling the plan's persisted intermediates
    (the size-tagged banded signatures)."""

    def __init__(self, *dfs):
        self._dfs = dfs

    def unpersist(self, blocking: bool = False):
        for d in self._dfs:
            d.unpersist(blocking)


def lsh_params_for_tau(
    tau: float,
    target_recall: float = 0.99,
    max_bands: int = 64,
) -> tuple[int, int]:
    """(bits_per_band, bands) sized for a recall target at ``tau``.

    Sign-LSH per-plane collision probability for a pair at cosine tau is
    p1 = 1 - acos(tau)/pi (Charikar'02); a band of b bits collides with
    p1^b and recall over k bands is 1-(1-p1^b)^k.  Longer bands mean
    fewer random candidates (2^-bits per band for cos~0 pairs) but need
    more bands for the same recall — so pick the LONGEST band width whose
    band count stays under ``max_bands``:

        tau=0.95 -> (16, 23)   tau=0.90 -> (16, 53)
        tau=0.85 -> (12, 46)   tau=0.80 -> (10, 44)

    Below tau~0.75 no width fits and the widest-feasible fallback keeps
    recall at the cost of candidate volume — at that point an IVF-style
    search (operators/ann.py) is the better tool; callers like
    embedding_neardup_pairs(strategy='auto') route there instead."""
    import math

    p1 = 1.0 - math.acos(max(-1.0, min(1.0, tau))) / math.pi
    best = None
    for bits in (16, 14, 12, 10, 8, 6, 4):
        p_band = p1 ** bits
        if p_band >= 1.0:  # tau == 1
            return bits, 1
        bands = math.ceil(
            math.log(1.0 - target_recall) / math.log(1.0 - p_band)
        )
        if best is None:
            best = (bits, min(bands, max_bands))  # widest as fallback
        if bands <= max_bands:
            return bits, bands
    return best


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
    oversize: str = "star",
) -> DataFrame:
    """(src, dst, cosine) pairs with cosine >= tau, src < dst.

    ``max_bucket`` guards degenerate buckets (mass-duplicate content):
    quadratic pairing is capped there.  ``oversize`` picks what happens
    above the cap:
    - 'star' (default): each oversized bucket emits only (bucket-min,
      member) candidates — LINEAR in bucket size.  Star candidates still
      pass through the cosine verify, so downstream connected components
      collapse the bucket into one cluster only for members that score
      >= tau against the bucket-min member (the common degenerate case —
      mass COPIES — verifies at cosine ~1.0 and stays fully connected;
      a mixed oversized bucket keeps only its true near-dup star edges,
      by design).  This is the SCALE.md "sample-representative for
      degenerate components" device: a 10^9-copy boilerplate page costs
      10^9 edges, not 10^18.
    - 'drop': oversized buckets generate nothing (route such content
      through exact dedup first).

    ``group_col``: restrict pairing to rows sharing this column (the
    SCALE.md stage-3 sharding — e.g. canonicalize per linked entity
    neighborhood at 10^12 mentions, where even sub-quadratic global
    banding is infeasible).  The group simply joins the band key.
    """
    n_planes = bits_per_band * bands
    rng = np.random.default_rng(seed ^ 0x15A9)
    H = rng.standard_normal((dim, n_planes))
    bpb = bits_per_band

    H32 = H.astype(np.float32)  # sign() is robust to f32 rounding

    @pandas_udf("array<long>")
    def band_keys(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weights = (1 << np.arange(bpb, dtype=np.int64))
        # pack the band index into the key's high bits: one long join key
        # instead of (band int, key long) — halves the shuffle key width
        # through the explode, the bucket-size groupBy and the self-join
        offsets = np.arange(bands, dtype=np.int64) << bpb
        for s in batches:
            M = np.stack(s.to_numpy()).astype(np.float32)
            bits = (M @ H32) > 0  # [n, n_planes]
            keys = bits.reshape(len(M), bands, bpb).astype(np.int64) @ weights
            yield pd.Series(list(keys + offsets), dtype=object)

    # guide §4.4: the optimizer pushes the explode's null/emptiness
    # checks below the projection and re-evaluates the UDF once under
    # the filter and once in the projection (two stacked ArrowEvalPython
    # nodes in the executed plan).  The hyperplane GEMM is the dominant
    # per-row cost of this operator — marking it non-deterministic pins
    # a SINGLE evaluation (the value is in fact deterministic; the flag
    # only disables reordering/duplication).
    band_keys = band_keys.asNondeterministic()

    # banding over ids only — embeddings attach AFTER pair dedup, so the
    # candidate shuffle carries 2 ids instead of 2 vectors per row
    gcols = [group_col] if group_col else []
    nodes = df.select(
        F.col(id_col).alias("_id"), F.col(embedding_col).alias("_emb"),
        *gcols,
    )
    join_keys = gcols + ["_key"]
    # ONE exchange for the whole candidate side (round 7): hash-
    # repartition the banded rows by the bucket join key up front and
    # persist THAT.  The bucket-size aggregation, the size-attach join
    # and BOTH self-join sides then all consume the cached
    # HashPartitioning(join_keys) — zero further exchanges (the size
    # groupBy and the joins are satisfied by the cached distribution),
    # and the hyperplane GEMM UDF runs exactly once, into the cache.
    # Previously: sig was persisted unpartitioned, so the sizes groupBy
    # paid its own 23M-row exchange and the size-attach join a second
    # one.  Same cache count as before (sig + tagged), one exchange
    # instead of three on the candidate side.
    sig = nodes.withColumn("_keys", band_keys(F.col("_emb"))).select(
        "_id", *gcols, F.explode("_keys").alias("_key")
    ).repartition(*join_keys).persist()
    # bucket sizes via groupBy+join, NOT a window: a window partition
    # would SORT each partition by the bucket key; the hash agg avoids
    # the sort while the degenerate-bucket rows are already confined to
    # one partition by the repartition (exactly like the self-join
    # below requires).  tagged is persisted too: its four consumers
    # (both self-join sides, star 'big', star mins) would each
    # recompute the size aggregation + attach join otherwise (Catalyst
    # has no cross-branch CSE) — the plan showed the aggregation FOUR
    # times before this cache.
    sizes = sig.groupBy(*join_keys).agg(F.count(F.lit(1)).alias("_bn"))
    tagged = sig.join(sizes, join_keys).persist()
    sized = tagged.filter(F.col("_bn") <= max_bucket)

    a = sized.select(F.col("_id").alias("src"), *join_keys)
    b = sized.select(F.col("_id").alias("dst"), *join_keys)
    cand = (
        a.join(b, join_keys)
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    if oversize == "star":
        big = tagged.filter(F.col("_bn") > max_bucket)
        mins = big.groupBy(*join_keys).agg(F.min("_id").alias("_min"))
        star = (
            big.join(mins, join_keys)
            .filter(F.col("_id") != F.col("_min"))
            .select(
                F.col("_min").alias("src"), F.col("_id").alias("dst")
            )
        )
        cand = cand.unionByName(star)
    cand = cand.dropDuplicates(["src", "dst"])
    ea = nodes.select(F.col("_id").alias("src"), F.col("_emb").alias("_ea"))
    eb = nodes.select(F.col("_id").alias("dst"), F.col("_emb").alias("_eb"))
    out = (
        cand.join(ea, "src").join(eb, "dst")
        .withColumn("cosine", cosine_expr("_ea", "_eb"))
        .filter(F.col("cosine") >= tau)
        .select("src", "dst", "cosine")
    )
    out.signature_cache = _CacheHandle(sig, tagged)
    return out
