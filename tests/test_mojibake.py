"""mojibake_score — encoding-damage detection (round-9 addition; registry
key planned for the round-10 window budget). Damage fixtures are built by
the REAL failure mechanism (utf-8 bytes decoded as latin-1/cp1252), not by
pasting mangled literals, so the test pins the mechanism the operator
claims to detect. (Fixture strings avoid the five cp1252-undefined bytes
— 0x81/0x8D/0x8F/0x90/0x9D, e.g. the close-double-quote — which python's
strict cp1252 codec refuses; real-world decoders pass those through as
C1 controls, which the C1 signature catches instead.)"""

from pyspark.sql import functions as F

from mindsdb_spark.catalog import load_table
from mindsdb_spark.operators.text import mojibake_score


def _latin1(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


def _cp1252(s: str) -> str:
    return s.encode("utf-8").decode("cp1252")


def test_mojibake_detects_real_double_encoding(spark):
    rows = [
        (1, "plain ascii text, nothing wrong"),
        (2, "héllo — naïve café 日本語"),          # healthy unicode
        (3, _latin1("héllo wörld café")),            # Ã© Ã¶ Ã© fingerprints
        (4, _cp1252("it’s a “test – dash")),         # â€™ â€œ â€“ fingerprints
        (5, "bad � replacement � chars"),
        (6, "bare c1 control:" + chr(0x85) + "here"),
        (7, ""),                                      # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in mojibake_score(df).collect()}

    assert not got[1]["is_suspect"] and got[1]["damage_per_kchar"] == 0.0
    assert not got[2]["is_suspect"], dict(got[2].asDict())  # no false positive
    assert got[3]["is_suspect"] and got[3]["n_moj2"] >= 3
    assert got[4]["is_suspect"] and got[4]["n_moj3"] >= 3
    assert got[5]["n_replacement"] == 2 and got[5]["is_suspect"]
    assert got[6]["n_c1"] == 1 and got[6]["is_suspect"]
    assert not got[7]["is_suspect"] and got[7]["damage_per_kchar"] == 0.0


def test_mojibake_clean_on_fixture_corpus(spark, sf_dir):
    """The synthetic fixture corpus is healthy utf-8: zero suspects — the
    false-positive rate on normal text is the operator's real contract."""
    docs = load_table(spark, sf_dir, "documents")
    n_suspect = (
        mojibake_score(docs).filter(F.col("is_suspect")).count()
    )
    assert n_suspect == 0


def test_mojibake_duckdb_parity(spark, sf_dir):
    """The same counts must be reproducible in DuckDB with the same
    patterns (the round-10 oracle shape): regexp_count vs
    len(regexp_extract_all) over a mixed healthy/damaged corpus."""
    import duckdb

    from mindsdb_spark.operators.text import (
        C1_CONTROLS, MOJIBAKE_2BYTE, MOJIBAKE_3BYTE, REPLACEMENT_CHAR,
    )

    rows = [
        (1, _latin1("héllo wörld café")),
        (2, _cp1252("it’s “quoted – ok")),
        (3, "clean text with — em dash and café"),
        (4, "repl � here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_moj2"], r["n_moj3"], r["n_c1"], r["n_replacement"])
        for r in mojibake_score(df).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for pat_name, pat, idx in (
        ("moj2", MOJIBAKE_2BYTE, 0),
        ("moj3", MOJIBAKE_3BYTE, 1),
        ("c1", C1_CONTROLS, 2),
        ("rep", REPLACEMENT_CHAR, 3),
    ):
        duck = dict(con.execute(
            "SELECT doc_id, len(regexp_extract_all(text, ?)) FROM t",
            [pat],
        ).fetchall())
        for doc_id, counts in got.items():
            assert counts[idx] == duck[doc_id], (pat_name, doc_id)


def test_ascii_fast_path_ignores_astral_planes(spark):
    """Round-10 fast path gates the four signature regexes on
    length(text) == octet_length(text). That equality must hold ONLY for
    pure-ASCII docs: Spark's length() counts codepoints, so a 4-byte
    astral char (e.g. U+10348) gives 1 char vs 4 bytes and the doc takes
    the regex path — damage hiding behind astral chars is still counted."""
    astral_damaged = "\U00010348 gothic " + _latin1("héllo")  # non-BMP + moj2
    df = spark.createDataFrame(
        [(1, astral_damaged), (2, "pure ascii"), (3, "\U0001F600 clean emoji")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in mojibake_score(df).collect()}
    assert got[1]["is_suspect"] and got[1]["n_moj2"] >= 1
    assert not got[2]["is_suspect"]
    assert not got[3]["is_suspect"]


def test_null_text_scores_clean_not_null(spark):
    """Round-9 review finding: regexp_count(NULL) yields NULL counts and a
    NULL is_suspect that drops the row from BOTH the suspect filter and
    its negation. NULL text must score 0 / not-suspect like empty text."""
    df = spark.createDataFrame(
        [(1, None), (2, "clean"), (3, _latin1("héllo"))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in mojibake_score(df).collect()}
    assert got[1]["is_suspect"] is False
    assert got[1]["n_moj2"] == 0 and got[1]["damage_per_kchar"] == 0.0
    suspects = mojibake_score(df).filter(F.col("is_suspect")).count()
    healthy = mojibake_score(df).filter(~F.col("is_suspect")).count()
    assert suspects + healthy == 3  # no row vanishes into NULL-land
