"""Unit tests for the round-10 text additions: readability (Flesch /
FK grade, JVM-only map stage) and nfc_scrub (Arrow-batched NFC + JVM
control strip / whitespace collapse). Hand-computed expectations here;
DuckDB parity lives in tests/test_r11_candidates.py."""

import math
import unicodedata

import pytest

from mindsdb_spark.engine import EngineSession
from mindsdb_spark.operators.text import nfc_scrub, readability


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_readability_hand_computed(spark):
    out = {
        r["doc_id"]: r
        for r in readability(
            _mk(spark, [(1, "Hello world. It works!"), (2, "go!")])
        ).collect()
    }
    r = out[1]
    # words: hello world. it works! -> 4; sentences: '.' '!' -> 2
    # syllables (vowel groups, floor 1/word): he-llo 2, world 1, it 1,
    # works 1 -> 5
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (4, 2, 5)
    wps, spw = 4 / 2, 5 / 4
    assert math.isclose(r["flesch"], 206.835 - 1.015 * wps - 84.6 * spw,
                        abs_tol=1e-6)
    assert math.isclose(r["fk_grade"], 0.39 * wps + 11.8 * spw - 15.59,
                        abs_tol=1e-6)
    r2 = out[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 1)


def test_readability_null_and_empty(spark):
    out = {
        r["doc_id"]: r
        for r in readability(_mk(spark, [(1, ""), (2, None), (3, "   ")])).collect()
    }
    for i in (1, 3):
        assert out[i]["n_words"] == 0
        assert out[i]["flesch"] is None and out[i]["fk_grade"] is None
    assert out[2]["flesch"] is None


def test_readability_no_vowel_tokens_floor(spark):
    # pure-consonant / numeric tokens floor at 1 syllable each (the
    # standard heuristic's behavior; zero would zero the whole doc)
    r = readability(_mk(spark, [(1, "42 7 xyz")])).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
    # xyz has the vowel-ish y: one group; 42 and 7 floor to 1 each


def test_nfc_scrub_composes_strips_collapses(spark):
    rows = [
        (1, "cafe\u0301  du  monde"),  # decomposed
        (2, "tab\tand\x0bvtab\x07bell"),
        (3, "  already clean  "),
        (4, None),
        (5, "untouched text"),
    ]
    out = {r["doc_id"]: r for r in nfc_scrub(_mk(spark, rows)).collect()}
    assert out[1]["clean_text"] == "caf\u00e9 du monde"  # composed + collapsed
    assert out[1]["changed"]
    # \t is kept whitespace -> space; \x0b and \x07 are stripped controls
    assert out[2]["clean_text"] == "tab andvtabbell"
    assert out[2]["changed"]
    assert out[3]["clean_text"] == "already clean" and out[3]["changed"]
    assert out[4]["clean_text"] is None and out[4]["changed"] is False
    assert out[5]["clean_text"] == "untouched text" and not out[5]["changed"]


def test_nfc_matches_python_unicodedata(spark):
    # the pandas-UDF NFC step must be plain unicodedata NFC: decomposed
    # Hangul and a already-composed char round-trip identically
    probes = ["\u1100\u1161\u11a8", "\uc548\ub155", "A\u030a", "\u00c5"]
    rows = [(i, p) for i, p in enumerate(probes)]
    out = {r["doc_id"]: r["clean_text"]
           for r in nfc_scrub(_mk(spark, rows)).collect()}
    for i, p in enumerate(probes):
        assert out[i] == unicodedata.normalize("NFC", p)


def test_readability_nfc_sql_doors(spark, sf_dir):
    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["documents"])
    rd = sess.sql(
        "SELECT * FROM readability(tpch_documents) ORDER BY doc_id LIMIT 4"
    )
    assert rd.columns == [
        "doc_id", "n_words", "n_sentences", "n_syllables", "flesch", "fk_grade"
    ]
    assert rd.count() == 4
    ns = sess.sql(
        "SELECT * FROM nfc_scrub(tpch_documents) ORDER BY doc_id LIMIT 4"
    )
    assert ns.columns == ["doc_id", "clean_text", "changed"]
    # the fixture corpus is ASCII-clean single-spaced: nothing changes
    assert all(not r["changed"] for r in ns.collect())


def test_readability_plan_is_single_map_stage(spark):
    df = readability(_mk(spark, [(1, "a b c.")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle
