"""File source: CSV / JSON / parquet with format sniffing.

Reference: the file handler sniffs the format from content and loads via
pandas into DuckDB (reference:
mindsdb/integrations/handlers/file_handler/file_handler.py:80-196; format
detection integrations/utilities/files/file_reader.py:27-214). Here the
sniffed format dispatches to the matching distributed Spark reader —
spark.read.{csv,json,parquet} — so file size is unbounded. XLS/PDF/TXT
variants the reference supports via pandas readers are out of scope for
this container (no openpyxl/pdf libs); TXT degenerates to a one-column CSV.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

PARQUET_MAGIC = b"PAR1"


def sniff_format(path: str) -> str:
    """Detect csv/json/parquet from extension, falling back to content."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("csv", "tsv", "json", "jsonl", "ndjson", "parquet", "txt"):
        return {"jsonl": "json", "ndjson": "json", "tsv": "csv", "txt": "csv"}.get(ext, ext)
    with open(path, "rb") as f:
        head = f.read(64)
    if head[:4] == PARQUET_MAGIC:
        return "parquet"
    stripped = head.lstrip()
    if stripped[:1] in (b"{", b"["):
        return "json"
    return "csv"


def read_file(spark: SparkSession, path: str, **options) -> DataFrame:
    """Load a data file with the sniffed format's distributed reader."""
    fmt = sniff_format(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.options(**options).json(path)
    sep = "\t" if path.endswith(".tsv") else options.pop("sep", ",")
    return (
        spark.read.options(header=True, inferSchema=True, sep=sep, **options).csv(path)
    )
