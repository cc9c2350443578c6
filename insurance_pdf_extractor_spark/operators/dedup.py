"""Deduplication operators for large-scale document corpora.

All hot-path computation is JVM-side column expressions (hashing,
array ops); no Python UDFs. Scale notes per operator:

- exact dedup: one hash-shuffle on the fingerprint; the fingerprint is
  computed map-side so the shuffle carries (fp, id), not text.
- MinHash+LSH: signatures are computed map-side; candidate generation
  shuffles only (band_key, id) pairs; verification joins re-read text
  for candidates only. At 10^12 docs the band shuffle is the dominant
  cost and is tunable via (n_hashes, bands).
- SimHash: 64-bit fingerprint computed map-side; near-dup blocking on
  16-bit chunks (hamming<=3 within 4 chunks guarantee).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text_expr(col: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def fingerprint_expr(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized text."""
    return F.md5(normalize_text_expr(col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text,
    keeping the min id (deterministic winner)."""
    return (
        df.withColumn("fp", fingerprint_expr(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
    )


def words_expr(col: Column) -> Column:
    return F.split(normalize_text_expr(col), " ")


def shingles_expr(col: Column, k: int = 3) -> Column:
    """Word k-shingles as strings (empty array when doc shorter than k)."""
    w = words_expr(col)
    n = F.size(w)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice(w, i, k), " "),
        )
    )


#: Mersenne prime modulus for the affine MinHash permutation family.
_MINHASH_P = 2305843009213693951  # 2^61 - 1


def hashed_shingles_expr(shingles: Column) -> Column:
    """Shingle strings → 64-bit hashes. Compute this ONCE into its own
    column before :func:`minhash_signature_expr` — inlining it would make
    Catalyst re-evaluate the whole shingle pipeline per hash slot (a
    measured ~36× slowdown at 64 hashes)."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def minhash_signature_expr(hashes: Column, n_hashes: int = 64) -> Column:
    """n_hashes-wide MinHash signature over a PRE-HASHED shingle array
    (see :func:`hashed_shingles_expr`). Hash family: deterministic affine
    permutations ``(h*a_i + b_i) mod (2^61-1)`` — JVM-side arithmetic
    only, one `transform`+`array_min` per slot over the shared hash
    column. Empty docs get the sentinel max so they never collide via
    banding with real content."""
    return F.array(
        *[
            F.coalesce(
                F.array_min(
                    F.transform(
                        hashes,
                        lambda h: F.pmod(
                            h * F.lit(2 * i + 1) + F.lit(i * 0x9E3779B9), F.lit(_MINHASH_P)
                        ),
                    )
                ),
                F.lit(_MINHASH_P),
            )
            for i in range(n_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    min_jaccard: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= min.
    """
    rows_per_band = n_hashes // bands
    # two-step projection: hash the shingles once, THEN build the
    # n_hashes-slot signature over the shared hash column (keeps the
    # shingle pipeline out of the per-slot expression tree)
    hashed = df.select(
        F.col(id_col).alias("id"),
        hashed_shingles_expr(shingles_expr(F.col(text_col), shingle_k)).alias("h"),
    )
    sig = hashed.select("id", minhash_signature_expr(F.col("h"), n_hashes).alias("sig"))
    # band rows are SLIM — (id, band, band_key) only. At corpus scale the
    # band shuffle dominates; carrying wordsets here would multiply the
    # shuffle payload by bands× the document vocabulary.
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.array_join(F.slice("sig", b * rows_per_band + 1, rows_per_band), ",")).alias(
                        "band_key"
                    ),
                ),
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.band_key")

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact-Jaccard verification joins wordsets back for CANDIDATES only
    words = df.select(
        F.col(id_col).alias("wid"), F.array_distinct(words_expr(F.col(text_col))).alias("ws")
    )
    pairs = (
        cand.join(words.select(F.col("wid").alias("id_a"), F.col("ws").alias("ws_a")), "id_a")
        .join(words.select(F.col("wid").alias("id_b"), F.col("ws").alias("ws_b")), "id_b")
    )
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    union = F.size(F.array_union("ws_a", "ws_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_expr(text_col: Column, bits: int = 64) -> Column:
    """SimHash fingerprint as a signed 64-bit long: per-token xxhash64,
    majority vote per bit position, all JVM-side via aggregate/zip_with."""
    tokens = words_expr(text_col)
    bit_votes = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                    for b in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp.bitwiseOR(
            F.when(
                F.element_at(bit_votes, b + 1) > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return fp


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit chunks (pigeonhole —
    hamming<=3 over 64 bits means at least one of 4 chunks is equal),
    verify with bit_count(xor)."""
    fp = df.select(F.col(id_col).alias("id"), simhash_expr(F.col(text_col)).alias("fp"))
    chunks = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("fp"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "fp", "ck.chunk", "ck.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
