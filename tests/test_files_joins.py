"""File-format sniffing extensions + cross-join guard parity."""

import os

import pytest

from mindsdb_spark.operators.joins import guarded_cross_join
from mindsdb_spark.sources.files import read_file, sniff_format


def test_sniff_txt_and_magic(tmp_path):
    p = tmp_path / "notes.txt"
    p.write_text("hello\nworld\n")
    assert sniff_format(str(p)) == "txt"
    pdf = tmp_path / "doc.bin"
    pdf.write_bytes(b"%PDF-1.7 rest")
    assert sniff_format(str(pdf)) == "pdf"
    xlsx = tmp_path / "table.bin"
    xlsx.write_bytes(b"PK\x03\x04 rest")
    assert sniff_format(str(xlsx)) == "xlsx"


def test_read_txt_one_row_per_line(spark, tmp_path):
    p = tmp_path / "notes.txt"
    p.write_text("alpha\nbeta\n")
    df = read_file(spark, str(p))
    assert df.columns == ["text"]
    assert sorted(r["text"] for r in df.collect()) == ["alpha", "beta"]


def test_read_pdf_raises_not_implemented(spark, tmp_path):
    p = tmp_path / "doc.pdf"
    p.write_bytes(b"%PDF-1.7\n...")
    with pytest.raises(NotImplementedError):
        read_file(spark, str(p))


def test_cross_join_guard_allows_small(spark):
    a = spark.range(100)
    b = spark.range(50).withColumnRenamed("id", "id2")
    assert guarded_cross_join(a, b).count() == 5000


def test_cross_join_guard_refuses_blowup(spark):
    a = spark.range(10_000)
    b = spark.range(10_000).withColumnRenamed("id", "id2")
    with pytest.raises(ValueError, match="without condition"):
        guarded_cross_join(a, b)
