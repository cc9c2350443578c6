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
