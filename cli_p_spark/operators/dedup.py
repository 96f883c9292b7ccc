"""Deduplication operators for large-scale corpus curation.

The reference's only dedup is exact path-presence (build-index.py:42-44);
a 100 TB training-data pipeline needs content-level dedup.  All operators
here are DataFrame-native with the same shape:

    candidates (cheap, hash/bucket based, shuffle on bucket)
      -> verify (exact metric on candidate pairs only)
      -> connected components (operators/ccomp.py)
      -> keep min-id representative per duplicate cluster

Families:
- exact_dedup            md5(content) groupBy — one shuffle, no UDF
- minhash_lsh_pairs      word-shingle MinHash, banded LSH self-join,
                         exact-Jaccard verification
- simhash_pairs          64-bit SimHash, banded Hamming candidates,
                         exact Hamming verification (bit ops, JVM-side)
- embedding_neardup_pairs  cosine near-dup via the IVF self-join
                           (operators/ann.py — same machinery as entity
                           linking, tau near 1.0)

Determinism: every hash is seeded (xxhash64 with fixed salt columns or
NumPy hashes derived from config.SEED); candidate generation and
verification are pure functions of content.

Scale notes: the only shuffles are the band-bucket groupBys and the final
CC; band buckets are high-cardinality (hash of signature slice) so AQE
coalescing handles them; hot buckets (boilerplate text) are the skew case
— the verify step bounds per-bucket work to |bucket|^2, so near-duplicate
explosions should be capped with a bucket-size guard (max_bucket)."""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import SEED

# Mersenne prime for universal hashing
_P = (1 << 61) - 1


def _stable_hash(s: str) -> int:
    """Process-independent 64-bit string hash (Python's hash() varies with
    PYTHONHASHSEED across executors — never use it in a Spark UDF)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """(content_hash, keep_id, n_copies): keep = min id per hash group."""
    return df.groupBy(F.md5(F.col(content_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _shingles(text: str, w: int) -> set[int]:
    toks = text.lower().split()
    if len(toks) < w:
        return {_stable_hash(" ".join(toks))} if toks else set()
    return {
        _stable_hash(" ".join(toks[i: i + w]))
        for i in range(len(toks) - w + 1)
    }


def make_minhash_udf(n_hashes: int = 64, shingle_w: int = 3,
                     seed: int = SEED):
    """text -> array<long> of n_hashes MinHash values (word shingles).

    h_i(x) = finalize(a_i * x + b_i mod 2^64) — multiply-add with natural
    uint64 wraparound plus a splitmix64-style finisher (xor-shift, odd
    multiply, xor-shift).  A plain (a*x+b) mod P family is NOT usable
    here: for x << P the product never wraps the modulus, h is monotone
    in x, and every hash picks the same min shingle (zero min-wise
    independence — found the hard way).  Vectorized NumPy
    [n_shingles, n_hashes] broadcasting per document."""
    rng = np.random.default_rng(seed)
    A = (rng.integers(0, 1 << 63, size=n_hashes, dtype=np.uint64) << 1) | 1
    B = rng.integers(0, 1 << 63, size=n_hashes, dtype=np.uint64)
    _FIN = np.uint64(0xFF51AFD7ED558CCD)

    @pandas_udf("array<long>")
    def minhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        old = np.seterr(over="ignore")  # uint64 wraparound is intended
        try:
            for s in batches:
                out = []
                for text in s:
                    sh = _shingles(text or "", shingle_w)
                    if not sh:
                        out.append(np.zeros(n_hashes, dtype=np.int64))
                        continue
                    x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
                    v = x[:, None] * A[None, :] + B[None, :]
                    v ^= v >> np.uint64(33)
                    v *= _FIN
                    v ^= v >> np.uint64(29)
                    hv = v.min(axis=0)
                    out.append((hv >> np.uint64(1)).astype(np.int64))
                yield pd.Series(out, dtype=object)
        finally:
            np.seterr(**old)

    return minhash


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    jaccard_threshold: float = 0.7,
    seed: int = SEED,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (src, dst, jaccard) with jaccard >= threshold.

    Candidates: rows colliding in >=1 of `bands` bands (rows/band =
    n_hashes/bands).  Verification: exact estimated Jaccard = fraction of
    agreeing MinHash components (unbiased estimator; for exact set
    Jaccard swap in a shingle-set join — estimator keeps verification a
    fixed-width column compare, scale-friendly)."""
    r = n_hashes // bands
    mh = make_minhash_udf(n_hashes, shingle_w, seed)
    sig = df.select(
        F.col(id_col).alias("_id"), mh(F.col(content_col)).alias("_sig")
    )

    band_cols = [
        F.xxhash64(
            F.lit(b), F.slice("_sig", b * r + 1, r).cast("array<string>")
        ).alias(f"_b{b}")
        for b in range(bands)
    ]
    banded = sig.select(
        "_id", "_sig",
        F.posexplode(F.array(*band_cols)).alias("_band", "_bucket"),
    )
    # bucket-size guard: degenerate buckets (boilerplate) are dropped and
    # should be routed to exact_dedup instead of quadratic verification
    sized = banded.withColumn(
        "_bn",
        F.count(F.lit(1)).over(Window.partitionBy("_band", "_bucket")),
    ).filter(F.col("_bn") <= max_bucket)

    a = sized.select(
        F.col("_id").alias("src"), F.col("_sig").alias("_sig_a"),
        "_band", "_bucket",
    )
    b = sized.select(
        F.col("_id").alias("dst"), F.col("_sig").alias("_sig_b"),
        "_band", "_bucket",
    )
    cand = (
        a.join(b, ["_band", "_bucket"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", "_sig_a", "_sig_b")
        .dropDuplicates(["src", "dst"])
    )
    agree = F.aggregate(
        F.zip_with("_sig_a", "_sig_b",
                   lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("jaccard", agree / F.lit(n_hashes))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("src", "dst", "jaccard")
    )


def make_simhash_udf(bits: int = 64, seed: int = SEED):
    """text -> long SimHash fingerprint: sign of token-hash-vector sum."""
    rng = np.random.default_rng(seed ^ 0x51A7)
    # per-bit random sign is derived from the token hash itself: bit j of
    # xxhash-like mix decides +1/-1 — no stored planes needed
    mix_a = int(rng.integers(1, _P))
    mix_b = int(rng.integers(0, _P))

    @pandas_udf("long")
    def simhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            out = np.zeros(len(s), dtype=np.int64)
            for i, text in enumerate(s):
                toks = (text or "").lower().split()
                if not toks:
                    continue
                hs = np.fromiter(
                    ((_stable_hash(t) * mix_a + mix_b) % _P for t in toks),
                    dtype=np.uint64, count=len(toks),
                )
                # expand each 61-bit hash to `bits` sign bits
                cols = np.arange(bits, dtype=np.uint64)
                signbits = ((hs[:, None] >> (cols[None, :] % 61)) & 1)
                acc = np.where(signbits == 1, 1, -1).sum(axis=0)
                fp = 0
                for j in range(bits):
                    if acc[j] > 0:
                        fp |= 1 << j
                out[i] = np.int64(np.uint64(fp).astype(np.int64))
            yield pd.Series(out)

    return simhash


def simhash_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    seed: int = SEED,
) -> DataFrame:
    """Near-dup pairs (src, dst, hamming) with hamming <= max_hamming.

    Candidates: equal 16-bit band of the 64-bit fingerprint (pigeonhole:
    hamming <= bands-1 guarantees >=1 identical band; max_hamming=3 with
    4 bands is exact-complete).  Verification: JVM-side popcount via
    bit_count(xor) — no Python in the verify path."""
    sh = make_simhash_udf(64, seed)
    fp = df.select(F.col(id_col).alias("_id"),
                   sh(F.col(content_col)).alias("_fp"))
    width = 64 // bands
    mask = (1 << width) - 1
    band_cols = [
        (F.shiftrightunsigned("_fp", b * width).bitwiseAND(F.lit(mask)))
        .alias(f"_b{b}")
        for b in range(bands)
    ]
    banded = fp.select(
        "_id", "_fp", F.posexplode(F.array(*band_cols)).alias("_band", "_key")
    )
    a = banded.select(F.col("_id").alias("src"),
                      F.col("_fp").alias("_fa"), "_band", "_key")
    b = banded.select(F.col("_id").alias("dst"),
                      F.col("_fp").alias("_fb"), "_band", "_key")
    cand = (
        a.join(b, ["_band", "_key"])
        .filter(F.col("src") < F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("src", "dst", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact word-n-gram Jaccard pairs via shingle inverted index —
    no crossJoin: explode shingles, self-join on shingle, count
    intersections, compute |A|,|B| by id, Jaccard = inter/(|A|+|B|-inter).
    Pure DataFrame ops (SQL-oracle-able)."""
    toks = F.split(F.lower(F.col(content_col)), " ")
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ).alias("_g"),
    ).distinct()
    sizes = grams.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    a = grams.select(F.col("_id").alias("src"), "_g")
    b = grams.select(F.col("_id").alias("dst"), "_g")
    inter = (
        a.join(b, "_g")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sz_a = sizes.select(F.col("_id").alias("src"), F.col("_sz").alias("_sa"))
    sz_b = sizes.select(F.col("_id").alias("dst"), F.col("_sz").alias("_sb"))
    return (
        inter.join(sz_a, "src").join(sz_b, "dst")
        .withColumn(
            "jaccard",
            F.col("_inter")
            / (F.col("_sa") + F.col("_sb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("src", "dst", "jaccard")
    )


def winnow_neardup_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    min_shared: int = 4,
    w: int = 8,
    k: int = 4,
    seed: int = SEED,
) -> DataFrame:
    """Near-dup pairs via winnowing fingerprints (Schleimer et al.,
    SIGMOD'03): docs sharing >= min_shared selected k-gram mins.  Same
    inverted-index join shape as ngram_jaccard_pairs but over the
    winnowed subset — candidate volume scales with fingerprint density
    (~2/(w+1) of grams), not full gram sets."""
    from ..functions.text import make_winnow_udf

    winnow = make_winnow_udf(w=w, k=k, seed=seed)
    fps = df.select(
        F.col(id_col).alias("_id"),
        F.explode(winnow(F.col(content_col))).alias("_fp"),
    ).distinct()
    a = fps.select(F.col("_id").alias("src"), "_fp")
    b = fps.select(F.col("_id").alias("dst"), "_fp")
    return (
        a.join(b, "_fp")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    tau: float = 0.95,
    nlist: int = 100,
    nprobe: int = 32,
    k: int = 10,
    seed: int = SEED,
    strategy: str = "ivf",
) -> DataFrame:
    """Cosine near-duplicate pairs.

    strategy='ivf': broadcast IVF self-join (operators/ann.py) — right
    when the whole vector set fits executors and tau is moderate.
    strategy='lsh': banded sign-LSH (operators/lsh.py) — the
    sub-quadratic path for tau near 1 at corpus scale.
    """
    from .ann import link_ivf_broadcast, train_centroids

    if strategy == "lsh":
        from .lsh import hyperplane_lsh_pairs

        dim = len(df.select(embedding_col).first()[0])
        nodes = df.select(
            F.col(id_col).cast("string").alias("_nid"),
            F.col(embedding_col).alias("_emb"),
        )
        nrm = F.sqrt(
            F.aggregate(
                F.transform("_emb", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x.cast("double"),
            )
        )
        unit = nodes.select(
            "_nid",
            F.transform(
                "_emb",
                lambda x: (x / F.when(nrm < 1e-9, F.lit(1.0)).otherwise(nrm))
                .cast("float"),
            ).alias("_emb"),
        )
        return hyperplane_lsh_pairs(
            unit, "_emb", "_nid", tau=tau, dim=dim, seed=seed
        )

    pdf = df.select(
        F.col(id_col).cast("string").alias("entity_id"),
        F.col(embedding_col).alias("embedding"),
    ).toPandas()
    emat = np.stack(pdf["embedding"].to_numpy())
    norms = np.linalg.norm(emat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    pdf = pdf.assign(embedding=list((emat / norms).astype(np.float32)))
    centroids = train_centroids(emat / norms, nlist=nlist, seed=seed)
    # normalize probe side JVM-side to unit vectors for cosine
    nrm = F.sqrt(
        F.aggregate(
            F.transform(embedding_col, lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x.cast("double"),
        )
    )
    probe = df.select(
        F.col(id_col).cast("string").alias("probe_id"),
        F.transform(
            embedding_col, lambda x: (x / F.when(nrm < 1e-9, 1.0).otherwise(nrm)).cast("float")
        ).alias("embedding"),
    )
    links = link_ivf_broadcast(
        probe, pdf, centroids, k=k, tau=tau, nprobe=nprobe
    )
    return (
        links.filter(F.col("probe_id") != F.col("entity_id"))
        .select(
            F.least("probe_id", "entity_id").alias("src"),
            F.greatest("probe_id", "entity_id").alias("dst"),
            F.col("score").alias("cosine"),
        )
        .dropDuplicates(["src", "dst"])
    )


def dedup_keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Resolve near-dup pairs to one kept row per duplicate cluster
    (connected components, min-id representative)."""
    from .ccomp import canonical_mapping, connected_components

    comps = connected_components(pairs.select("src", "dst"))
    mapping = canonical_mapping(
        comps, df.select(F.col(id_col).cast("string").alias("node"))
    )
    keep = mapping.filter(F.col("node") == F.col("canonical_id")).select(
        F.col("node").alias("_keep")
    )
    return df.join(
        keep, df[id_col].cast("string") == F.col("_keep"), "left_semi"
    )
