"""End-to-end corpus curation plan: the composition a training-data
team actually runs, built from the individually-gated operators.

    raw docs
      → quality gate   (token bounds, quality score, Gopher repetition)
      → PII redaction  (codegen'd regexp cascade)
      → exact dedup    (fingerprint groupBy, keep min id)
      → near-dup dedup (MinHash+LSH pairs → connected components →
                        keep each cluster's minimum id)
      → split + sample (salt-separated md5 decisions)
      → packing layout (fixed token-budget training chunks)

Every stage is the operator already proven by its own driver gate —
this module only owns the composition and the stage-count accounting.
All stages are lazy; `stage_counts` forces one count per stage and is
optional (skip it in production, read the counters off the Spark UI or
the lineage sink instead).

Scale shape: quality + PII + fingerprints + sampling are map-side;
the exact-dup groupBy shuffles (fp, id); MinHash shuffles slim band
keys; clustering shuffles (node, label) pairs bounded by the near-dup
graph; packing shuffles (bucket, okey, id, n_tokens). No stage ever
shuffles document text except the MinHash candidate verify (candidates
only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pii import redact_pii_expr
from ..operators import dedup, text_quality as tq
from ..operators.packing import pack_documents
from ..operators.sampling import hash_sample_expr, hash_split_expr


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 8,
    max_tokens: int = 100_000,
    min_quality: float = 0.2,
    max_dup_5gram_frac: float = 0.6,
    min_jaccard: float = 0.2,
    sample_fraction: float = 1.0,
    pack_budget: int = 512,
    profile: bool = False,
    tokenizer: str = "whitespace",
) -> dict:
    """Returns {"survivors": DataFrame(id, text, split),
    "packing": DataFrame(id, n_tokens, start_offset, chunk_id, ...),
    "stages": [stage names in order]} — call :func:`stage_counts` for
    the per-stage funnel.

    ``profile=True`` adds corpus-profiling outputs {"vocab", "tfidf",
    "profile_tf"} over the survivors via
    :func:`..operators.text_quality.corpus_profile`: both aggregates
    share ONE persisted (doc, word, tf) frame, so the survivor text is
    scanned once — not once per profiling output (the standalone
    tfidf_top_terms pays a second scan for n_docs). The caller owns
    ``result["profile_tf"].unpersist()`` after materializing both.

    ``tokenizer`` picks the token counter the quality bounds and the
    packing budget run on: 'whitespace' (codegen'd column expr) or
    'bpe' (real merges-table encoder, operators/bpe.py — one Arrow
    kernel riding the same scan; use it when chunks must tile a real
    tokenizer's budget)."""
    if tokenizer == "whitespace":
        count_tokens = tq.token_count_expr(F.col(text_col))
    elif tokenizer == "bpe":
        from ..operators.bpe import bpe_token_count_udf

        count_tokens = bpe_token_count_udf()(F.col(text_col))
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r} (whitespace|bpe)")
    base = docs.select(F.col(id_col), F.col(text_col))

    quality = (
        tq.repetition_stats(
            base.withColumn("n_tokens", count_tokens)
            .withColumn(
                "quality", tq.quality_score_expr(F.col(text_col), F.length(text_col))
            )
        )
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("quality") >= min_quality)
            & (F.col("dup_5gram_frac") <= max_dup_5gram_frac)
        )
        .select(id_col, text_col, "n_tokens")
    )

    redacted = quality.withColumn(text_col, redact_pii_expr(F.col(text_col)))

    keepers = dedup.exact_dedup(redacted, text_col=text_col, id_col=id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    exact = redacted.join(keepers, id_col, "left_semi")

    pairs = dedup.minhash_lsh_pairs(exact, min_jaccard=min_jaccard, id_col=id_col, text_col=text_col)
    clusters = dedup.dedup_clusters(pairs)
    # survivors: docs that are their own cluster minimum, plus docs in
    # no cluster at all (left anti on the drop set)
    drops = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    near_deduped = exact.join(drops, id_col, "left_anti")

    sampled = near_deduped.filter(
        hash_sample_expr(F.col(id_col), sample_fraction)
    ).withColumn("split", hash_split_expr(F.col(id_col)))

    packing = pack_documents(
        sampled.select(id_col, "n_tokens"),
        id_col=id_col,
        token_col="n_tokens",
        budget=pack_budget,
    )
    out: dict = {}
    if profile:
        prof = tq.corpus_profile(sampled, text_col=text_col, id_col=id_col)
        out.update(
            {"vocab": prof["vocab"], "tfidf": prof["tfidf"], "profile_tf": prof["tf"]}
        )
    return out | {
        "survivors": sampled.select(id_col, text_col, "n_tokens", "split"),
        "packing": packing,
        "_stages": {
            "raw": base,
            "quality": quality,
            "exact_dedup": exact,
            "near_dedup": near_deduped,
            "sampled": sampled,
        },
    }


def stage_counts(curated: dict) -> dict[str, int]:
    """Force the funnel: one count action per stage, in pipeline order."""
    return {name: df.count() for name, df in curated["_stages"].items()}
