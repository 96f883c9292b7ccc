"""Deterministic weighted sampling without replacement: priority
sampling (Duffield, Lund & Thorup, JACM 2007).

Why priority sampling and not Efraimidis-Spirakis A-ES: A-ES keys are
u^(1/w) (equivalently -ln(u)/w) — a transcendental whose last-ulp
behavior differs between the JVM's Math.log and DuckDB's libm, so the
cross-engine hash gate could flip on a boundary tie.  Priority
sampling's key q = w / u needs ONE floating division, and IEEE-754
division is correctly rounded on every engine — q is bit-identical
between Spark and DuckDB by construction.  It also carries a stronger
guarantee: with threshold tau = the (k+1)-th largest priority, the
estimator  est_weight = max(w, tau)  over the k kept items is an
unbiased estimator of ANY subset-sum of the original weights (and for
k+1 samples has no larger variance than the optimal off-line scheme).

The uniform draw is deterministic, seeded, and engine-portable:
  u = (first-52-bits-of-md5(id || ':' || seed) + 1) / 2^52  in (0, 1],
exactly the md5-threshold device the corpus split/sample operators
already use (corpus.py:111-229), extended from hex-string comparison to
an exact power-of-two rational (both the +1 numerator and the /2^52 are
exact in f64, so u itself is bit-identical cross-engine).

Scale shape: Spark plans orderBy(q).limit(k+1) as
TakeOrderedAndProject — per-partition top-(k+1) heaps + a single merge,
NO global sort, no shuffle of the data (only k+1 rows move).  The
row_number window that splits tau from the kept rows runs over k+1 rows
(one partition, bounded by k).  At 10^12 documents the cost is one scan.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TWO52 = float(1 << 52)  # 4503599627370496.0


def _uniform(id_col: str, seed: str) -> F.Column:
    """Deterministic u in (0, 1] from md5(id || ':' || seed): exact
    52-bit rational, bit-identical on any engine with IEEE doubles."""
    h52 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    return (h52 + F.lit(1)).cast("double") / F.lit(TWO52)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    seed: str = "17",
) -> DataFrame:
    """Weighted sample of ``k`` rows (fewer iff the input has < k rows
    with positive weight): (id, weight, priority, est_weight) where
    est_weight = max(weight, tau) is the unbiased subset-sum estimator
    (module docstring).  When the input has <= k positive-weight rows,
    tau = 0 and est_weight = weight exactly — the estimator degrades to
    the identity, as it should."""
    if k <= 0:
        raise ValueError("k must be positive")
    base = df.filter(F.col(weight_col) > 0).select(
        F.col(id_col).alias("id"),
        F.col(weight_col).alias("weight"),
        (
            F.col(weight_col).cast("double") / _uniform(id_col, seed)
        ).alias("priority"),
    )
    # TakeOrderedAndProject: distributed top-(k+1), no global sort
    topk1 = base.orderBy(F.desc("priority"), F.asc("id")).limit(k + 1)
    w = Window.orderBy(F.desc("priority"), F.asc("id"))
    ranked = topk1.withColumn("_rn", F.row_number().over(w))
    tau = ranked.filter(F.col("_rn") == k + 1).agg(
        F.coalesce(F.min("priority"), F.lit(0.0)).alias("_tau")
    )
    return (
        ranked.filter(F.col("_rn") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            "id",
            "weight",
            "priority",
            F.greatest(F.col("weight").cast("double"), F.col("_tau")).alias(
                "est_weight"
            ),
        )
    )


def priority_sample_sql(
    source_rel: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "17",
) -> str:
    """DuckDB twin: identical md5 bits, identical single-division
    priority, identical (priority DESC, id ASC) top-k and tau."""
    return f"""
WITH s AS (
  SELECT {id_col} AS id, {weight_col} AS weight,
         CAST({weight_col} AS DOUBLE) /
           ((('0x' || substr(md5(CAST({id_col} AS VARCHAR) || ':{seed}'),
                      1, 13))::BIGINT + 1) / {TWO52!r}) AS priority
  FROM {source_rel} WHERE {weight_col} > 0),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, id) AS rn
      FROM s),
tau AS (SELECT COALESCE(MIN(priority), 0.0) AS tau FROM r
        WHERE rn = {k + 1})
SELECT id, weight, priority,
       GREATEST(CAST(weight AS DOUBLE), tau.tau) AS est_weight
FROM r, tau WHERE rn <= {k}
"""
