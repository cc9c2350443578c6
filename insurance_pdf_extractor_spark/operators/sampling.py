"""Deterministic hash-based sampling and dataset splitting — the
selection stage of a training-data pipeline (corpus → per-stratum
quota sample → train/val/test split).

Design: every decision is a pure function of a stable key
(``md5(key || salt)`` compared against a hex threshold), so

* the sample is **reproducible** across runs, Spark versions and
  cluster sizes — no RNG, no seed plumbing, no partition-order
  dependence (``df.sample`` is none of these across repartitions);
* membership is a **map-side filter**: no shuffle, no driver state,
  predicate-pushdown-friendly. At 10^12 docs this is the only shape
  that works — a 0.1% stratified sample is one scan, zero exchanges;
* **decisions compose independently**: the sample hash and the split
  hash use different salts, so sampling at a higher rate later does
  not reshuffle anyone's train/test assignment (the classic leakage
  bug when one hash drives both).

The reference selects work deterministically by filename ordering
(reference ``app/services/pdf_processor.py`` batch paths); at corpus
scale the equivalent contract is "same key ⇒ same decision", which
hashing gives without any global sort.

Thresholds use the first 12 hex chars of the md5 digest (48 bits —
granularity 3.6e-15, far below any meaningful sampling rate) compared
lexicographically; md5 hex is uniform, so P(digest < hex(f·16^12)) = f
up to quantization. Both Spark and DuckDB emit lowercase hex md5,
which is what makes every decision here expressible 1:1 in the gate
oracle SQL.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 12  # 48 bits of the digest: plenty below any real rate


def hex_threshold(fraction: float) -> str:
    """Hex string t such that P(substr(md5,1,12) < t) == fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        # int(16^12) formats to THIRTEEN hex chars, which sorts BELOW
        # any digest starting '2'..'f' ('1' < '2' lexicographically) —
        # fraction 1.0 would silently keep ~1/16 of rows. 'g' is above
        # every hex digit, so 'gggggggggggg' compares above all digests.
        return "g" * _HEX_DIGITS
    return format(int(fraction * 16**_HEX_DIGITS), f"0{_HEX_DIGITS}x")


def _digest(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, _HEX_DIGITS)


def hash_sample_expr(key: Column, fraction: float, salt: str = ":sample") -> Column:
    """Boolean keep/drop decision for a deterministic Bernoulli sample."""
    return _digest(key, salt) < F.lit(hex_threshold(fraction))


def stratified_sample(
    df: DataFrame,
    key: Column,
    strata: Column,
    fractions: Mapping[str, float],
    default: float = 0.0,
    salt: str = ":sample",
) -> DataFrame:
    """Per-stratum deterministic sample: keep each row iff its key
    digest falls under its stratum's threshold. One map-side filter —
    no shuffle regardless of corpus size or stratum skew."""
    thr: Column = F.lit(hex_threshold(default))
    for value, fraction in fractions.items():
        thr = F.when(strata == value, F.lit(hex_threshold(fraction))).otherwise(thr)
    return df.filter(_digest(key, salt) < thr)


def hash_split_expr(
    key: Column,
    weights: Mapping[str, float] | None = None,
    salt: str = ":split",
) -> Column:
    """Label column assigning each key to a named split (train/val/
    test by default) via cumulative hash thresholds. Uses a different
    salt than sampling so re-sampling at a new rate never migrates a
    document across splits."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    digest = _digest(key, salt)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = digest < F.lit(hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def mix_sources(
    df: DataFrame,
    key: Column,
    source: Column,
    weights: Mapping[str, float],
    budget: int | None = None,
    salt: str = ":mix",
) -> DataFrame:
    """Domain-mixture balancing: downsample each source so the KEPT
    corpus approaches the target mixture ``weights`` (e.g. {'web': .6,
    'books': .3, 'code': .1}) — the data-mixing stage of a training
    pipeline (cf. The Pile / DoReMi-style static mixtures).

    Rates come from one tiny per-source count aggregate (shuffle of
    n_sources rows): with ``budget`` tokens/docs targeted overall, the
    keep rate for source s is min(1, budget*w_s / n_s); without a
    budget, the largest feasible corpus matching the mixture exactly is
    taken (bound by the scarcest source: budget = min_s n_s / w_s).
    Selection itself is the same map-side md5-threshold filter as
    :func:`stratified_sample` — no corpus shuffle, reproducible at any
    cluster size, monotone in the budget (growing the budget only ADDS
    documents; no reshuffling of prior picks).

    Upsampling (rate > 1) is out of scope here: repeat-aware mixtures
    multiply epochs on the small source rather than duplicate rows
    (duplication would collide with the dedup stages upstream).
    """
    sources = list(weights)
    counts = {
        r["_src"]: r["n"]
        for r in df.select(source.alias("_src"))
        .filter(F.col("_src").isin(sources))
        .groupBy("_src")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = [s for s in sources if counts.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"sources absent from the corpus: {missing}")
    if budget is None:
        budget = int(min(counts[s] / w for s, w in weights.items() if w > 0))
    fractions = {s: min(1.0, budget * w / counts[s]) for s, w in weights.items()}
    return stratified_sample(df, key, source, fractions, default=0.0, salt=salt)


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169). Select raw-corpus documents whose hashed-n-gram
# bag-of-words distribution looks like a TARGET corpus: fit unigram+
# bigram bucket models on both, score each doc by
# log w(x) = Σ_b count_b(x)·(log p_target(b) − log p_raw(b)), then
# resample with the Gumbel top-k trick.
#
# Scale shape: the bucket model is n_buckets rows (one map-side-combined
# groupBy per corpus) and ships as a BROADCAST to the scoring join, so
# scoring is explode → broadcast-join → one (doc) re-aggregation — the
# only shuffle is the slim (doc_id, partial-sum) exchange. The Gumbel
# noise reuses this module's md5 discipline (pure function of
# doc_id+salt: reproducible at any parallelism, no RNG state).
#
# Feature hashing uses md5 (not xxhash64) so the whole computation is
# expressible 1:1 in the DuckDB gate oracle: bucket =
# ('0x' || substr(md5(feat),1,8))::bigint % n_buckets on both engines.
# ---------------------------------------------------------------------------


def _dsir_words(text: Column) -> Column:
    from ..operators.dedup import words_expr

    return F.filter(words_expr(text), lambda w: w != "")


def dsir_features_expr(text: Column) -> Column:
    """Unigrams + adjacent bigrams ("w1 w2") as one string array — the
    paper's hashed n-gram feature set."""
    ws = _dsir_words(text)
    n = F.size(ws)
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    return F.concat(ws, bigrams)


def dsir_bucket_expr(feat: Column, n_buckets: int) -> Column:
    """Feature → bucket id via the first 32 md5 bits (md5 so DuckDB can
    recompute it verbatim; 32 bits ≫ any practical n_buckets)."""
    return F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("bigint") % n_buckets


def _bucket_counts(docs: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    feats = docs.select(
        F.explode(dsir_features_expr(F.col(text_col))).alias("feat")
    ).select(dsir_bucket_expr(F.col("feat"), n_buckets).alias("bucket"))
    return feats.groupBy("bucket").agg(F.count("*").alias("n"))


def dsir_bucket_table(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, logratio) for every bucket 0..n_buckets-1, Laplace-
    smoothed: ln((n_t+α)/(T+α·m)) − ln((n_r+α)/(R+α·m)). Buckets unseen
    in BOTH corpora still carry the (constant) smoothed ratio so the
    scoring join never drops a feature."""
    spark = target.sparkSession
    t = _bucket_counts(target, text_col, n_buckets).withColumnRenamed("n", "n_t")
    r = _bucket_counts(raw, text_col, n_buckets).withColumnRenamed("n", "n_r")
    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = (
        grid.join(t, "bucket", "left").join(r, "bucket", "left").na.fill(0, ["n_t", "n_r"])
    )
    # 1-row totals broadcast into every row (the corpus_profile pattern)
    totals = joined.agg(
        F.sum("n_t").alias("tot_t"), F.sum("n_r").alias("tot_r")
    )
    m = float(n_buckets)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("n_t") + alpha) / (F.col("tot_t") + alpha * m))
            - F.log((F.col("n_r") + alpha) / (F.col("tot_r") + alpha * m))
        ).alias("logratio"),
    )


def dsir_scores(
    docs: DataFrame,
    bucket_table: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, logw): per-document importance log-weight.
    explode_outer keeps feature-less docs as one null-bucket row, so
    the ONLY shuffle is the final (id) re-aggregation — no doc-keyed
    join-back (which would be a second full-corpus exchange at scale);
    the bucket join is a broadcast of n_buckets rows. Empty docs score
    logw = 0 (the paper's empty-product convention)."""
    feats = docs.select(
        F.col(id_col), F.explode_outer(dsir_features_expr(F.col(text_col))).alias("feat")
    ).select(id_col, dsir_bucket_expr(F.col("feat"), n_buckets).alias("bucket"))
    return (
        feats.join(F.broadcast(bucket_table), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_feats"),
            F.coalesce(F.sum("logratio"), F.lit(0.0)).alias("logw"),
        )
    )


def dsir_gumbel_key_expr(logw: Column, key: Column, salt: str = ":dsir") -> Column:
    """Gumbel top-k resampling key: logw + Gumbel(0,1) noise derived
    from the md5-uniform of the row key — sampling WITHOUT replacement
    proportional to w(x) (Gumbel-max), deterministic at any
    parallelism. u ∈ (0,1] has 48-bit granularity; u=0 cannot occur
    (md5 of a fixed key is a constant, and the +1 shift keeps ln
    finite)."""
    u = (
        (F.conv(_digest(key, salt), 16, 10).cast("double") + 1.0)
        / float(16**_HEX_DIGITS)
    )
    return logw - F.log(-F.log(u))


def dsir_select(
    docs: DataFrame,
    bucket_table: DataFrame,
    k: int,
    text_col: str = "text",
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    salt: str = ":dsir",
) -> DataFrame:
    """Top-k Gumbel resample by importance weight — the full DSIR
    selection. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    scored = dsir_scores(docs, bucket_table, text_col, n_buckets, id_col)
    keyed = scored.withColumn(
        "gumbel_key", dsir_gumbel_key_expr(F.col("logw"), F.col(id_col), salt)
    )
    return keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col)).limit(k)


def dsir_select_fraction(
    docs: DataFrame,
    bucket_table: DataFrame,
    fraction: float,
    text_col: str = "text",
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    salt: str = ":dsir",
    rel_err: float = 0.001,
) -> DataFrame:
    """Fraction-based DSIR selection — the corpus-scale path. Exact
    top-k (``dsir_select``) materializes k rows on the driver via
    TakeOrderedAndProject, which is wrong when k is millions; here the
    Gumbel-key cutoff is estimated with approxQuantile (one pass,
    Greenwald-Khanna) and selection becomes a pure map-side filter —
    no global sort, no driver materialization. The kept count is
    approximate within ``rel_err`` of the requested fraction."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0,1], got {fraction}")
    scored = dsir_scores(docs, bucket_table, text_col, n_buckets, id_col)
    keyed = scored.withColumn(
        "gumbel_key", dsir_gumbel_key_expr(F.col("logw"), F.col(id_col), salt)
    )
    if fraction >= 1.0:
        return keyed
    (thr,) = keyed.stat.approxQuantile("gumbel_key", [1.0 - fraction], rel_err)
    return keyed.filter(F.col("gumbel_key") >= thr)
