"""Interleaved A/B: packed single-long LSH band keys vs the round-3
(band int, key long) two-column layout, at canon bench scale.

Sequential cross-session comparisons on this VM drift up to 1.7x
(NOTES.md), so both variants run interleaved in ONE session, min-of-N
per variant.  The 'unpacked' variant below is a frozen replica of the
pre-packing plan (operators/lsh.py before this change), kept here only
as the A/B baseline.

Usage: python tools/ab_bandpack.py [n_mentions] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cli_p_spark.config import SEED
from cli_p_spark.operators.link import cosine_expr


def unpacked_lsh_pairs(df, embedding_col, id_col, tau, dim,
                       bits_per_band, bands, group_col,
                       seed=SEED, max_bucket=2000):
    """Frozen pre-packing replica of hyperplane_lsh_pairs (two-column
    (band, key) join keys, posexplode) — the A/B baseline."""
    n_planes = bits_per_band * bands
    rng = np.random.default_rng(seed ^ 0x15A9)
    H32 = rng.standard_normal((dim, n_planes)).astype(np.float32)
    bpb = bits_per_band

    @pandas_udf("array<long>")
    def band_keys(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weights = (1 << np.arange(bpb, dtype=np.int64))
        for s in batches:
            M = np.stack(s.to_numpy()).astype(np.float32)
            bits = (M @ H32) > 0
            keys = bits.reshape(len(M), bands, bpb).astype(np.int64) @ weights
            yield pd.Series(list(keys), dtype=object)

    gcols = [group_col] if group_col else []
    nodes = df.select(
        F.col(id_col).alias("_id"), F.col(embedding_col).alias("_emb"),
        *gcols,
    )
    sig = nodes.withColumn("_keys", band_keys(F.col("_emb"))).select(
        "_id", *gcols, F.posexplode("_keys").alias("_band", "_key")
    ).persist()
    join_keys = gcols + ["_band", "_key"]
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
    big = tagged.filter(F.col("_bn") > max_bucket)
    mins = big.groupBy(*join_keys).agg(F.min("_id").alias("_min"))
    star = (
        big.join(mins, join_keys)
        .filter(F.col("_id") != F.col("_min"))
        .select(F.col("_min").alias("src"), F.col("_id").alias("dst"))
    )
    cand = cand.unionByName(star).dropDuplicates(["src", "dst"])
    ea = nodes.select(F.col("_id").alias("src"), F.col("_emb").alias("_ea"))
    eb = nodes.select(F.col("_id").alias("dst"), F.col("_emb").alias("_eb"))
    out = (
        cand.join(ea, "src").join(eb, "dst")
        .withColumn("cosine", cosine_expr("_ea", "_eb"))
        .filter(F.col("cosine") >= tau)
        .select("src", "dst", "cosine")
    )
    out._caches = (sig, tagged)
    return out


def main():
    n_mentions = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entry_mod
    from cli_p_spark.fixtures.distributed import distributed_mentions
    from cli_p_spark.operators.lsh import (
        hyperplane_lsh_pairs,
        lsh_params_for_tau,
    )
    from cli_p_spark.session import get_spark

    spark = get_spark(app="ab-bandpack", master="local[32]",
                      shuffle_partitions=32)
    entry_mod._ensure_workers(spark)

    import atexit
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="ab_bandpack_")
    atexit.register(shutil.rmtree, base, True)
    path = base + "/mentions"
    distributed_mentions(spark, n_mentions).write.mode("overwrite").parquet(
        path
    )
    m = spark.read.parquet(path)
    bits, bands = lsh_params_for_tau(0.95)

    def run_packed():
        pairs = hyperplane_lsh_pairs(
            m, "embedding", "mention_id", tau=0.95, dim=64,
            bits_per_band=bits, bands=bands, group_col="grp",
        )
        n = pairs.count()
        pairs.signature_cache.unpersist(blocking=True)
        return n

    def run_unpacked():
        pairs = unpacked_lsh_pairs(
            m, "embedding", "mention_id", tau=0.95, dim=64,
            bits_per_band=bits, bands=bands, group_col="grp",
        )
        n = pairs.count()
        for c in pairs._caches:
            c.unpersist(blocking=True)
        return n

    # warm both plan shapes once (JIT, python worker spawn)
    run_packed(), run_unpacked()

    best = {"packed": 1e18, "unpacked": 1e18}
    edges = {}
    for _ in range(reps):
        for tag, fn in (("unpacked", run_unpacked), ("packed", run_packed)):
            t0 = time.time()
            edges[tag] = fn()
            best[tag] = min(best[tag], time.time() - t0)

    assert edges["packed"] == edges["unpacked"], edges
    print(json.dumps({
        "n_mentions": n_mentions,
        "n_edges": edges["packed"],
        "lsh_bits_bands": [bits, bands],
        "unpacked_s": round(best["unpacked"], 3),
        "packed_s": round(best["packed"], 3),
        "speedup": round(best["unpacked"] / best["packed"], 3),
        "reps": reps,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
