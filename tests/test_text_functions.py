"""Edge-case unit tests for the text column-function library."""

from __future__ import annotations

import pyspark.sql.functions as F

from odl_etl_spark.functions.text import (
    mean_token_len,
    predicted_lang,
    punct_ratio,
    quality_score,
    token_count,
    tokens,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).head()["v"]


def test_tokens_handles_whitespace_runs_and_case(spark):
    assert _one(spark, "  Foo   BAR  baz ", F.array_join(tokens("text"), ",")) == "foo,bar,baz"
    assert _one(spark, "", token_count("text")) == 0
    assert _one(spark, "   ", token_count("text")) == 0


def test_quality_score_bounds(spark):
    for text in ["", "the a of", "x " * 200, "!!! ??? ...", "word"]:
        v = _one(spark, text, quality_score("text"))
        assert 0.0 <= v <= 1.0, (text, v)


def test_quality_prefers_stopworded_prose_over_noise(spark):
    prose = "the quick brown fox jumps over the lazy dog " * 5
    noise = "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"
    assert _one(spark, prose, quality_score("text")) > _one(spark, noise, quality_score("text"))


def test_predicted_lang_profiles_and_und(spark):
    assert _one(spark, "der hund und die katze ist da", predicted_lang("text")) == "de"
    assert _one(spark, "the cat is a pet of mine", predicted_lang("text")) == "en"
    assert _one(spark, "xyzzy plugh quux", predicted_lang("text")) == "und"
    assert _one(spark, "", predicted_lang("text")) == "und"


def test_mean_token_len_and_punct_ratio(spark):
    assert _one(spark, "ab cd", mean_token_len("text")) == 2.0
    assert _one(spark, "abcd", punct_ratio("text")) == 0.0
    assert _one(spark, "a,b", punct_ratio("text")) > 0.0


def test_canonical_url_edge_cases(spark):
    from odl_etl_spark.functions.text import canonical_url

    cases = {
        # case + www + default port + utm + fragment, all at once
        "HTTPS://WWW.Example.COM:443/Docs/3/?utm_source=x&ref=1#frag":
            "https://example.com/Docs/3?ref=1",
        # only tracking params -> query dropped entirely
        "https://example.com/a?utm_source=x&utm_campaign=y":
            "https://example.com/a",
        # middle utm param repairs the separators
        "https://example.com/a?x=1&utm_m=2&y=3": "https://example.com/a?x=1&y=3",
        # http default port; path case preserved
        "HTTP://Example.com:80/KeepCase": "http://example.com/KeepCase",
        # non-default port survives
        "https://example.com:8443/a": "https://example.com:8443/a",
        # already canonical -> fixpoint
        "https://example.com/a?x=1": "https://example.com/a?x=1",
        # bare host, trailing slash
        "https://example.com/": "https://example.com",
        # no scheme -> canonicalized conservatively (no host to lower)
        "example.com/A/?utm_x=1": "example.com/A",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonical_url("u").alias("c")).collect()
    }
    assert got == cases


def test_canonical_url_is_idempotent(spark):
    from odl_etl_spark.functions.text import canonical_url

    urls = [
        "HTTPS://WWW.A.COM:443/x/?utm_a=1&b=2#f",
        "http://a.com:80/",
        "https://a.com/a?utm_only=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(canonical_url("u").alias("c"))
    twice = once.select(canonical_url("c").alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]
