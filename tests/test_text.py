"""Text analysis expressions: token counts, ratios, lang-id, fingerprint."""

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count,
    text_profile,
)


def one(spark, text, expr, name="v"):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias(name)).first()[0]


def test_token_count(spark):
    assert one(spark, "a b  c   d", token_count(F.col("text"))) == 4
    assert one(spark, "   ", token_count(F.col("text"))) == 0
    assert one(spark, "single", token_count(F.col("text"))) == 1


def test_bpe_ish_token_count(spark):
    # words + punctuation pieces
    assert one(spark, "hello, world!", bpe_ish_token_count(F.col("text"))) == 4


def test_stopword_ratio(spark):
    assert one(spark, "the cat and the dog", stopword_ratio(F.col("text"))) == 0.6


def test_lang_id_markers(spark):
    assert one(spark, "der hund und die katze ist da", lang_id(F.col("text"))) == "de"
    assert one(spark, "the cat is here and there with us", lang_id(F.col("text"))) == "en"
    assert one(spark, "le chat et la maison est grande", lang_id(F.col("text"))) == "fr"
    assert one(spark, "xyzzy plugh qwerty", lang_id(F.col("text"))) == "und"


def test_fingerprint_matches_python(spark):
    text = "spark engine"
    expected = 0
    for ch in text:
        expected = (expected * 31 + ord(ch)) % 1_000_000_007
    assert one(spark, text, fingerprint(F.col("text"))) == expected


def test_quality_score_bounds(spark):
    good = one(spark, "the engine processes data and the results are stored in the table " * 3, quality_score(F.col("text")))
    bad = one(spark, "!!! ??? ;;; ::: @@@", quality_score(F.col("text")))
    assert 0.0 <= bad < good <= 1.0


def test_text_profile_columns(spark):
    df = spark.createDataFrame([(1, "the quick brown fox")], "doc_id long, text string")
    row = text_profile(df).first()
    for col in ("n_tokens", "stopword_ratio", "punct_ratio", "quality", "pred_lang", "fingerprint"):
        assert col in row.asDict()
