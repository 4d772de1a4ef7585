"""knn_classify — semi-supervised labeling by kNN majority vote
(round-9 addition; registry key planned for the round-10 window budget).
Checked two ways: a handcrafted geometry where the vote is obvious, and
brute-force numpy parity on the fixture embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindsdb_spark.catalog import load_table
from mindsdb_spark.operators.vector import knn_classify


def test_knn_classify_handcrafted_geometry(spark):
    # two tight clusters on orthogonal axes; queries sit inside each
    labeled = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [1.0, 0.05], 0),
            (4, [0.0, 1.0], 1), (5, [0.1, 0.9], 1), (6, [0.05, 1.0], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [0.95, 0.05]), (101, [0.02, 0.98])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in knn_classify(labeled, queries, k=3).collect()}
    assert out[100]["predicted_label"] == 0
    assert out[101]["predicted_label"] == 1
    assert out[100]["vote_strength"] == 3.0  # unanimous among k=3
    assert out[101]["vote_strength"] == 3.0


def test_knn_classify_vote_tiebreak_is_deterministic(spark):
    # k=2 with one neighbor from each cluster at equal similarity:
    # counts tie, summed similarity ties (symmetric construction), so the
    # smaller label must win
    labeled = spark.createDataFrame(
        [(1, [1.0, 0.0], 7), (2, [0.0, 1.0], 3)],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = knn_classify(labeled, queries, k=2).collect()[0]
    assert out["predicted_label"] == 3
    assert out["vote_strength"] == 1.0


def test_knn_classify_matches_numpy_on_fixture(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    labeled = emb.filter("vec_id >= 20")
    queries = emb.filter("vec_id < 20").select("vec_id", "embedding")
    got = {
        r["vec_id"]: (r["predicted_label"], r["vote_strength"])
        for r in knn_classify(labeled, queries, k=5).collect()
    }

    rows = emb.select("vec_id", "embedding", "label").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    labels = np.array([r["label"] for r in rows])
    vecs_n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    lab_mask = ids >= 20
    for qi in np.where(~lab_mask)[0]:
        sims = vecs_n[lab_mask] @ vecs_n[qi]
        nid = ids[lab_mask]
        nlb = labels[lab_mask]
        # neighbor ties by id: sort by (-sim, id)
        order = np.lexsort((nid, -sims))[:5]
        top_lbl = nlb[order]
        top_sim = sims[order]
        counts = {}
        for lb, s in zip(top_lbl, top_sim):
            c, t = counts.get(int(lb), (0, 0.0))
            counts[int(lb)] = (c + 1, t + float(s))
        want = sorted(counts.items(), key=lambda kv: (-kv[1][0], -kv[1][1], kv[0]))[0]
        assert got[int(ids[qi])][0] == want[0], int(ids[qi])
        assert got[int(ids[qi])][1] == pytest.approx(float(want[1][0]), abs=1e-9)


def test_knn_classify_weighted_votes(spark):
    # weighted: one very-close neighbor of label 1 beats two farther
    # label-0 neighbors
    labeled = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1),
            (2, [0.2, 1.0], 0), (3, [0.1, 1.0], 0),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.1])], "vec_id long, embedding array<double>"
    )
    unw = knn_classify(labeled, queries, k=3).collect()[0]
    assert unw["predicted_label"] == 0  # 2 votes vs 1
    wtd = knn_classify(labeled, queries, k=3, weighted=True).collect()[0]
    assert wtd["predicted_label"] == 1  # sim ~0.995 beats ~0.29 + ~0.20


def test_zero_norm_vector_cannot_hijack_topk(spark):
    """Round-9 review finding: cosine of a zero-norm embedding is 0/0 —
    under ANSI mode an un-guarded division KILLS the whole query
    (DIVIDE_BY_ZERO); with ANSI off the NaN sorts ABOVE +Inf descending
    and one failed-embedding row becomes every query's top neighbor. The
    try_divide→coalesce(-2) guard ranks it below every legitimate cosine
    and the query completes."""
    labeled = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [1.0, 0.05], 0),
            (4, [0.0, 0.0], 9),  # failed-embedding row, poison label
        ],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [0.95, 0.05])], "vec_id long, embedding array<double>"
    )
    out = knn_classify(labeled, queries, k=3).collect()[0]
    assert out["predicted_label"] == 0
    assert out["vote_strength"] == 3.0  # the zero vector took no slot
