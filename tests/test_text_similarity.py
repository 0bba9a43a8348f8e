"""Text/dedup/similarity operator tests on inline frames."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_shingles_count_and_content(spark):
    from big_data_flight_spark.operators.text import shingles

    d = _docs(spark, ["a b c d e"])
    out = sorted(r["shingle"] for r in shingles(d, 3).collect())
    assert out == ["a b c", "b c d", "c d e"]


def test_jaccard_detects_planted_near_dup(spark):
    import big_data_flight_spark.operators.text as text_mod

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")          # 1-word edit -> high jaccard
    far = "completely different words entirely unrelated content here now"
    d = _docs(spark, [base, near, far])
    orig = text_mod.table
    text_mod.table = lambda s, dd, n: d
    try:
        pairs = text_mod.text_near_dedup_jaccard(spark, "ignored").collect()
    finally:
        text_mod.table = orig
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["jaccard"] > 0.5


def test_exact_dedup_normalizes(spark):
    import big_data_flight_spark.operators.text as text_mod

    d = _docs(spark, ["Hello World", "  hello world ", "other text"])
    orig = text_mod.table
    text_mod.table = lambda s, dd, n: d
    try:
        out = text_mod.text_exact_dedup(spark, "ignored").collect()
    finally:
        text_mod.table = orig
    by_copies = sorted(r["n_copies"] for r in out)
    assert by_copies == [1, 2]  # the two hello-worlds collapse


def test_cosine_identical_vectors(spark):
    from big_data_flight_spark.operators.similarity import _dot, _norm

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])], "a array<float>, b array<float>"
    )
    (row,) = df.select(
        (_dot(F.col("a"), F.col("b")) / (_norm(F.col("a")) * _norm(F.col("b")))).alias("cos")
    ).collect()
    assert row["cos"] == pytest.approx(1.0, abs=1e-12)


def test_centroid_of_known_vectors(spark):
    from big_data_flight_spark.operators.similarity import _ordered_mean

    df = spark.createDataFrame([(1, 1.0), (1, 2.0), (1, 6.0)], "label int, val double")
    (row,) = df.groupBy("label").agg(_ordered_mean(F.col("val")).alias("m")).collect()
    assert row["m"] == pytest.approx(3.0, abs=1e-12)


def test_lsh_self_audit_reasonable(spark):
    from big_data_flight_spark.operators.similarity import sim_ann_lsh
    from tests.conftest import SF_SMOKE

    (row,) = sim_ann_lsh(spark, SF_SMOKE).collect()
    assert row["n_lsh_candidates"] > 0
    assert 0.0 <= row["recall"] <= 1.0


def test_kmeans_codebook_deterministic_and_shaped(spark):
    from big_data_flight_spark.io import table
    from big_data_flight_spark.operators.similarity import DIM, kmeans_codebook
    from tests.conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "embeddings")
    cb1 = {r["cell"]: list(r["centroid"]) for r in kmeans_codebook(e, k=4, iters=2).collect()}
    cb2 = {r["cell"]: list(r["centroid"]) for r in kmeans_codebook(e, k=4, iters=2).collect()}
    assert cb1 == cb2                      # deterministic across runs
    assert len(cb1) <= 4 and len(cb1) > 0  # cells may merge, never grow
    assert all(len(c) == DIM for c in cb1.values())
