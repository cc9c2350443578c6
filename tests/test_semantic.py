"""SemDeDup invariants: planted duplicates collapse to one kept
representative, the keep/dup_of graph is consistent, and the whole
computation is invariant to input partitioning (the property the
fixed-point integer centroid sums exist to guarantee)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.semantic import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = []
    # 6 well-separated base directions, 20 noisy members each
    bases = rng.normal(size=(6, DIM))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    vid = 0
    for b in bases:
        for _ in range(20):
            v = b + rng.normal(scale=0.05, size=DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # planted exact duplicates of vector 0
    for _ in range(3):
        rows.append((vid, rows[0][1]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_duplicates_collapse(spark, emb):
    out = semantic_dedup(emb, k=6, n_iter=3, threshold=0.9, dim=DIM).toPandas()
    assert len(out) == emb.count()
    dup_ids = {120, 121, 122}  # exact copies of vec 0
    group = out[out["vec_id"].isin(dup_ids | {0})]
    assert group["keep"].sum() == 1  # exactly one representative survives
    kept_id = int(group[group["keep"]]["vec_id"].iloc[0])
    dropped = group[~group["keep"]]
    assert set(dropped["dup_of"]) == {kept_id}


def test_dup_graph_consistent(spark, emb):
    out = semantic_dedup(emb, k=6, n_iter=3, threshold=0.6, dim=DIM).toPandas()
    kept = set(out[out["keep"]]["vec_id"])
    dropped = out[~out["keep"]]
    # every dropped row points at a KEPT row in the SAME cluster
    cluster_of = dict(zip(out["vec_id"], out["cluster_id"]))
    for _, r in dropped.iterrows():
        assert r["dup_of"] in kept
        assert cluster_of[r["dup_of"]] == r["cluster_id"]
    assert out[out["keep"]]["dup_of"].isna().all()


def test_partitioning_invariance(spark, emb):
    a = semantic_dedup(emb.repartition(11), k=6, n_iter=3, threshold=0.6, dim=DIM).collect()
    b = semantic_dedup(emb.coalesce(1), k=6, n_iter=3, threshold=0.6, dim=DIM).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmeans_clusters_separate_directions(spark, emb):
    C = kmeans_fit(emb, k=6, n_iter=4, dim=DIM)
    assert C.shape == (6, DIM)
    assigned = kmeans_assign(emb, C).toPandas()
    # members generated from one base direction should land together:
    # check the 20-member block of each base is dominated by one cluster
    for g in range(6):
        block = assigned[(assigned["vec_id"] >= g * 20) & (assigned["vec_id"] < (g + 1) * 20)]
        assert block["cluster_id"].value_counts().iloc[0] >= 15


def test_null_and_ragged_embeddings_dropped(spark, emb):
    bad = spark.createDataFrame(
        [(900, None), (901, [1.0] * (DIM - 3))],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(emb.unionByName(bad), k=6, n_iter=2, threshold=0.6, dim=DIM)
    ids = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert 900 not in ids and 901 not in ids
    assert out.count() == emb.count()
