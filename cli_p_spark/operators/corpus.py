"""Corpus-preparation operators for LLM training-data pipelines:
repetition-based quality stats, deterministic train/val splitting, and
token-budget sequence packing.

These extend the reference's per-file quality gate (extension filter +
decode-failure skip, build-index.py:32-34,53-61) to the document-level
curation a 100 TB text corpus needs before pretraining.  All three are
pure Catalyst (whole-stage codegen, SQL-oracle-able) — no Python in any
hot path.

Scale notes:
- repetition_stats is a pure per-row pass (round 7): gram counts are run
  lengths in the array_sort'ed per-doc gram arrays, folded with one
  `aggregate` HOF — no explode, ZERO shuffles, embarrassingly parallel
  at any corpus size.
- deterministic_split is a stateless map: the assignment is a pure
  function of the id (md5 prefix), so it needs NO shuffle, is stable
  under re-runs/backfills, and any engine can recompute membership.
- pack_sequences shards by an md5 prefix first, then packs WITHIN each
  shard with a running-sum window — the window partition is a shard,
  never the whole corpus, so there is no global sort and the parallelism
  is min(shards, executors).  Raise `shards` (hex prefix length) for
  bigger clusters: 1 hex char = 16 shards, 3 = 4096.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def repetition_stats(
    df: DataFrame, content_col: str, id_col: str, parts: int | None = None
) -> DataFrame:
    """Per-document repetition metrics (Gopher-family quality filters,
    Rae et al. 2021 'Scaling Language Models', Table A1 — adapted to
    word n-grams; this corpus has no line structure):

    - n_tokens          whitespace token count
    - top_word_frac     freq. of the most common word / n_tokens
    - top_bigram_frac   freq. of the most common 2-gram / n_2grams
    - dup_trigram_frac  fraction of 3-gram OCCURRENCES whose gram
                        appears >= 2 times

    High values mark boilerplate/degenerate docs a curation pass drops.
    NULL metric when the doc is too short to have that gram size
    (identical semantics in the SQL oracle).

    Round-7 shape: the metrics are PER-DOCUMENT functions of the token
    array, so they are computed per row — gram counts are run lengths in
    the array_sort'ed gram array, folded in one `aggregate` pass.  That
    removes the gram explode (~3L rows/doc) and ALL THREE shuffles of the
    previous groupBy cascade (plan: 3 Exchange -> 1 round-robin fan-out,
    zero wide dependencies; measured 1.46 s -> 0.91 s at sf0.1 on
    local[32] and exactly the value-identical output, verified against
    the unchanged SQL oracle at sf0.001 and sf0.1).  At corpus scale this
    is the difference between shuffling every gram and shuffling nothing.

    ``parts``: repartition width for the per-row pass (default: the
    cluster's defaultParallelism) — a small corpus may scan as 1-2
    partitions (single-row-group parquet), which would serialize the
    sort/fold work; pass parts=0 to skip the fan-out when the scan is
    already parallel."""
    parts = (
        parts
        if parts is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    toks = F.split(F.col(content_col), " ")
    out = df if not parts else df.repartition(parts)
    out = out.select(
        F.col(id_col), toks.alias("_t1"),
        _word_gram_strings(toks, 2).alias("_t2"),
        _word_gram_strings(toks, 3).alias("_t3"),
    ).select(
        id_col,
        F.size("_t1").alias("_n1"), _run_stats("_t1").alias("_s1"),
        F.size("_t2").alias("_n2"), _run_stats("_t2").alias("_s2"),
        F.size("_t3").alias("_n3"), _run_stats("_t3").alias("_s3"),
    )
    return out.select(
        id_col,
        F.col("_n1").cast("long").alias("n_tokens"),
        (F.col("_s1.maxrun").cast("double") / F.col("_n1")).alias(
            "top_word_frac"
        ),
        F.when(
            F.col("_n2") >= 1,
            F.col("_s2.maxrun").cast("double") / F.col("_n2"),
        ).alias("top_bigram_frac"),
        F.when(
            F.col("_n3") >= 1,
            F.col("_s3.dupc").cast("double") / F.col("_n3"),
        ).alias("dup_trigram_frac"),
    )


def _word_gram_strings(toks: Column, n: int) -> Column:
    """array<string> of word n-grams (empty when the doc is shorter than
    n tokens — sequence(1, stop) is DESCENDING for stop < 1, so the guard
    is load-bearing)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _run_stats(garr: Column) -> Column:
    """struct(maxrun long, dupc long) over a gram array: after
    array_sort, equal grams are adjacent, so the most-common-gram count
    is the longest run and the duplicate-occurrence count is the summed
    length of runs >= 2 — one fold, no shuffle, exact integer counts
    (identical to the groupBy-count formulation it replaced)."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("maxrun"),
        F.lit(0).cast("long").alias("dupc"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["maxrun"], run).alias("maxrun"),
            (
                acc["dupc"]
                + F.when(run == 2, 2).when(run > 2, 1).otherwise(0)
            ).alias("dupc"),
        )

    return F.aggregate(
        F.array_sort(garr),
        acc0,
        step,
        lambda acc: F.struct(
            acc["maxrun"].alias("maxrun"), acc["dupc"].alias("dupc")
        ),
    )


def split_assignment(id_col: str | Column, train_frac_hex: str = "cd") -> Column:
    """'train'/'val' as a pure function of md5(id): lexicographic
    threshold on the first two hex chars ('cd' => 205/256 ~ 80.1%
    train).  Content-stable (re-runs, backfills and OTHER ENGINES assign
    identically — the property that keeps eval sets leak-free across
    pipeline versions), uniform (md5), and shuffle-free."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.substring(F.md5(c.cast("string")), 1, 2)
    return F.when(h < F.lit(train_frac_hex), F.lit("train")).otherwise(
        F.lit("val")
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    content_col: str,
    train_frac_hex: str = "cd",
) -> DataFrame:
    """Per-split corpus accounting for a deterministic md5 train/val
    split: (split, n_docs, n_tokens, n_chars)."""
    return (
        df.select(
            split_assignment(id_col, train_frac_hex).alias("split"),
            F.size(F.split(F.col(content_col), " ")).alias("_tok"),
            F.length(content_col).alias("_ch"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_ch").alias("n_chars"),
        )
    )


def tfidf_keywords(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 3,
    parts: int | None = None,
) -> DataFrame:
    """Top-``k`` keywords per document by tf-idf — the document-tagging
    / topic-sketching pass of corpus triage.

    Scoring uses the log-free form score = tf * N / df — a DISTINCT
    (linear-idf) score chosen because ONE f64 division is bit-exact
    cross-engine while libm log differs in the last ulp (the
    hash-oracle-ability requirement).  It is NOT ranking-equivalent to
    standard tf * log(N/df) in general: the equivalence holds only
    between terms of EQUAL tf (log is monotone in N/df), but across
    unequal tfs the two scores can order differently (tf=1,df=1 vs
    tf=10,df=N/2), so the top-k can differ from log-idf tf-idf.  In
    practice it favors rarer terms slightly more aggressively.  Ties
    break by term ascending: a total (score, term) order per doc, so
    top-k is deterministic.

    Shape: one explode, two partial-agg groupBys, a per-doc window
    (bounded partition: a doc's distinct terms), and the doc-frequency
    side joins back on term — no driver-side vocabulary.  ``parts``
    spreads the token explode past a narrow input scan (see
    repetition_stats)."""
    parts = parts or df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(parts)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.lower(F.col(content_col)), " ")).alias("_term"),
    )
    tf = toks.groupBy("_id", "_term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))
    n = df.select(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("_term").asc()
    )
    return (
        tf.join(dfreq, "_term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf") * F.col("_n")).cast("double") / F.col("_df"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_id").alias(id_col), F.col("_term").alias("term"),
            "tf", "score",
        )
    )


def _rate_to_hex(rate: float, digits: int = 4) -> str:
    """Lexicographic md5-prefix threshold for a keep-rate: the first
    ``digits`` hex chars of md5 are uniform over 16^digits values, so
    keep iff prefix < hex(floor(rate * 16^digits)).  Resolution 1/65536
    at 4 digits."""
    n = min(max(int(rate * (16 ** digits)), 0), 16 ** digits)
    if n == 16 ** digits:  # rate 1.0: keep everything ('10000' > any 4-hex)
        return "g"  # lexicographically above every hex char
    return format(n, f"0{digits}x")


def mix_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix",
) -> Column:
    """Boolean keep-column for weighted corpus mixing: per-``group_col``
    (source/domain) Bernoulli keep-rates, deterministic in the id — the
    domain-reweighting step of pretraining-corpus assembly (e.g. the
    Pile / C4 mixture weights), as a pure function.

    Same engine-independence property as deterministic_split: membership
    is md5(salt || id) against a per-group lexicographic hex threshold,
    so re-runs, backfills and other engines reproduce the exact sample.
    The salt decorrelates this decision from the train/val split (an
    unsalted reuse of md5(id) would sample the same low-hash docs every
    time).  Shuffle-free; composes with any downstream aggregation."""
    c = F.col(id_col).cast("string")
    h = F.substring(F.md5(F.concat(F.lit(salt + ":"), c)), 1, 4)
    expr = F.lit(default_rate >= 1.0) if default_rate >= 1.0 else (
        h < F.lit(_rate_to_hex(default_rate))
    )
    for grp, rate in sorted(rates.items()):
        expr = F.when(
            F.col(group_col) == grp, h < F.lit(_rate_to_hex(rate))
        ).otherwise(expr)
    return expr


def mix_sample_stats(
    df: DataFrame,
    id_col: str,
    group_col: str,
    content_col: str,
    rates: dict[str, float],
) -> DataFrame:
    """Per-group mixing accounting: (group, n_docs_in, n_docs_kept,
    n_tokens_kept) for a deterministic weighted sample."""
    keep = mix_sample(df, id_col, group_col, rates)
    toks = F.size(F.split(F.col(content_col), " "))
    return (
        df.select(
            F.col(group_col).alias("grp"),
            keep.alias("_keep"),
            toks.alias("_tok"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs_in"),
            F.sum(F.col("_keep").cast("long")).alias("n_docs_kept"),
            F.coalesce(
                F.sum(F.when(F.col("_keep"), F.col("_tok"))), F.lit(0)
            ).cast("long").alias("n_tokens_kept"),
        )
    )


def sample_k_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    salt: str = "sample",
) -> DataFrame:
    """Uniform random sample of exactly min(k, |group|) rows per group,
    deterministically: rank by md5(salt || id) within the group and keep
    the k smallest (hash-priority sampling — Efraimidis-Spirakis with
    uniform weights, where the priority key is the hash itself, so no
    float keys and the sample is engine-reproducible).  The eval-set /
    human-review draw that stays STABLE across re-runs and backfills:
    adding new docs to a group only swaps members whose hash order
    changed, it never reshuffles the whole sample.

    Scale: one shuffle (the window partitionBy); per-group partitions.
    For groups too hot for a single partition, pre-filter with an
    approximate hash threshold (keep h < t where t oversamples ~2k) and
    re-rank the survivors — same result, bounded partition."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    content_col: str,
    id_col: str,
    budget: int = 512,
    shard_hex_chars: int = 1,
) -> DataFrame:
    """Greedy contiguous sequence packing: assign docs to fixed
    token-budget training sequences (bins), the pretraining step that
    turns a ragged document corpus into near-full context windows.

    Docs are sharded by an md5(id) prefix (16^shard_hex_chars shards),
    deterministically ordered within the shard by (md5, id), and a
    running token sum assigns bin = floor((cumsum - tokens)/budget) —
    each doc starts in the first bin with room before it.  Output is the
    per-bin manifest (shard, bin, n_docs, n_tokens, fill_ratio).

    The window partition is a SHARD (bounded, user-sized), never the
    corpus: no global sort, scales by adding shards.  Deterministic:
    shard, order, and bin are pure functions of (id, token count)."""
    toks = F.size(F.split(F.col(content_col), " "))
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col).alias("_id"),
        toks.alias("_tok"),
        F.substring(h, 1, shard_hex_chars).alias("shard"),
        h.alias("_h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = base.withColumn(
        "bin",
        F.floor((F.sum("_tok").over(w) - F.col("_tok")) / F.lit(budget)),
    )
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
        )
        .withColumn(
            # exact f64 (no rounding): token counts stay < 2^53 and the
            # oracle computes the identical division
            "fill_ratio",
            F.col("n_tokens").cast("double") / F.lit(budget),
        )
    )


def chunk_windows(
    df: DataFrame,
    content_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text): overlapping fixed-size
    token windows per document — the context-window chunking step every
    retrieval/pretraining pipeline runs before embedding or packing
    (stride < chunk_tokens gives the standard sliding overlap; the last
    window of a doc may be short).

    Window starts are 0, stride, 2*stride, ... while start < n_tokens,
    generated with `sequence` + `slice` — pure Catalyst (one narrow
    explode, no shuffle at all: the operator is a flatMap over the
    scan), deterministic strings/ints, hash-checkable cross-engine.
    A 10^12-doc corpus chunks embarrassingly parallel; downstream
    per-chunk embedding reuses the fused encode machinery."""
    if not (0 < stride):
        raise ValueError("stride must be positive")
    toks = F.split(F.col(content_col), r"\s+")
    base = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    ).filter(F.col("_n") > 0)
    starts = F.sequence(
        F.lit(0), F.col("_n") - F.lit(1), F.lit(stride)
    )
    exploded = base.select(
        "doc_id", "_toks",
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("_start") + F.lit(1), F.lit(chunk_tokens)
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def chunk_windows_sql(
    docs_rel: str, id_col: str, content_col: str,
    chunk_tokens: int = 128, stride: int = 96,
) -> str:
    """DuckDB twin of chunk_windows: same whitespace split, same start
    sequence, same 1-based inclusive slice semantics."""
    return f"""
WITH base AS (
  SELECT CAST({id_col} AS VARCHAR) AS doc_id,
         regexp_split_to_array({content_col}, '\\s+') AS toks,
         len(regexp_split_to_array({content_col}, '\\s+')) AS n
  FROM {docs_rel}),
starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, n - 1, {stride})) AS start
  FROM base WHERE n > 0)
SELECT doc_id, CAST(start // {stride} AS INTEGER) AS chunk_idx,
       CAST(len(toks[start + 1 : start + {chunk_tokens}]) AS INTEGER)
         AS n_tokens,
       array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ')
         AS chunk_text
FROM starts
"""


def pmi_collocations(
    df: DataFrame,
    content_col: str,
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, n_cooc, lift) — collocation mining over adjacent token
    pairs: lift = p(w1,w2) / (p(w1) p(w2)) with bigram probabilities
    from the bigram distribution (N2 pairs) and unigram probabilities
    from the token distribution (N1 tokens).  Classic PMI is log(lift);
    the log is left to the consumer so the emitted score stays in the
    exactly-portable fragment: lift = (c_ab * N1 * N1) /
    (c_a * c_b * N2) evaluated as an IDENTICAL double expression tree
    on both engines (every intermediate product of exact integer-valued
    doubles, then one division) — bit-identical cross-engine, rounded
    to 6 dp for the record.  Whitespace tokenization, same as
    repetition_stats.

    Scale shape: one explode for unigrams + one for bigrams, both
    partial-agg map-side (gram counts collapse within partitions — the
    repetition_stats discipline); the unigram join keys on the WORD
    (vocabulary-sized, not corpus-sized); the two totals ride a
    broadcast 1-row frame.  min_count prunes the bigram tail BEFORE the
    joins."""
    toks = F.split(F.col(content_col), " ")
    base = df.select(toks.alias("_t"))
    uni = (
        base.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("_cw"))
    )
    pairs = base.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("_t"), 1, F.size("_t") - 1),
                F.slice(F.col("_t"), 2, F.size("_t") - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
        .filter(F.col("n_cooc") >= min_count)
    )
    totals = uni.agg(F.sum("_cw").cast("double").alias("_n1")).crossJoin(
        pairs.agg(F.count(F.lit(1)).cast("double").alias("_n2"))
    )
    u1 = uni.withColumnsRenamed({"w": "w1", "_cw": "_c1"})
    u2 = uni.withColumnsRenamed({"w": "w2", "_cw": "_c2"})
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_cooc",
            F.round(
                (
                    F.col("n_cooc").cast("double")
                    * F.col("_n1")
                    * F.col("_n1")
                )
                / (
                    F.col("_c1").cast("double")
                    * F.col("_c2").cast("double")
                    * F.col("_n2")
                ),
                6,
            ).alias("lift"),
        )
    )


def pmi_sql(source_rel: str, content_col: str, min_count: int = 5) -> str:
    """DuckDB twin of pmi_collocations: parallel-unnest bigram zip,
    identical double expression tree for the lift."""
    return f"""
WITH toks AS (SELECT string_split({content_col}, ' ') AS t
              FROM {source_rel}),
uni AS (
  SELECT unnest(t) AS w FROM toks),
uc AS (SELECT w, COUNT(*) AS cw FROM uni GROUP BY w),
pairs AS (
  SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM toks),
bi AS (
  SELECT w1, w2, COUNT(*) AS n_cooc FROM pairs GROUP BY w1, w2
  HAVING COUNT(*) >= {min_count}),
tot AS (
  SELECT (SELECT CAST(SUM(cw) AS DOUBLE) FROM uc) AS n1,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM pairs) AS n2)
SELECT bi.w1, bi.w2, CAST(bi.n_cooc AS BIGINT) AS n_cooc,
       ROUND((CAST(bi.n_cooc AS DOUBLE) * tot.n1 * tot.n1)
             / (CAST(u1.cw AS DOUBLE) * CAST(u2.cw AS DOUBLE) * tot.n2),
             6) AS lift
FROM bi
JOIN uc u1 ON u1.w = bi.w1
JOIN uc u2 ON u2.w = bi.w2
CROSS JOIN tot
"""
