"""File source: CSV / JSON / parquet / XLSX / PDF / TXT with format sniffing.

Reference: the file handler sniffs the format from content and loads via
pandas into DuckDB (reference:
mindsdb/integrations/handlers/file_handler/file_handler.py:80-196; format
detection integrations/utilities/files/file_reader.py:27-214). Here the
sniffed format dispatches to the matching distributed Spark reader —
spark.read.{csv,json,parquet,text} — so file size is unbounded. XLSX goes
through pandas read_excel → createDataFrame (driver-side, like the
reference; gated on openpyxl being installed); PDF extraction likewise
requires a pdf library and raises NotImplementedError in this container.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

PARQUET_MAGIC = b"PAR1"
XLSX_MAGIC = b"PK\x03\x04"  # zip container
PDF_MAGIC = b"%PDF"


def sniff_format(path: str) -> str:
    """Detect csv/json/parquet/xlsx/pdf/txt from extension, else content."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    known = {
        "jsonl": "json",
        "ndjson": "json",
        "tsv": "csv",
        "xls": "xlsx",
    }
    if ext in ("csv", "tsv", "json", "jsonl", "ndjson", "parquet", "txt", "xlsx", "xls", "pdf"):
        return known.get(ext, ext)
    with open(path, "rb") as f:
        head = f.read(64)
    if head[:4] == PARQUET_MAGIC:
        return "parquet"
    if head[:4] == XLSX_MAGIC:
        return "xlsx"
    if head[:4] == PDF_MAGIC:
        return "pdf"
    stripped = head.lstrip()
    if stripped[:1] in (b"{", b"["):
        return "json"
    return "csv"


def read_file(spark: SparkSession, path: str, **options) -> DataFrame:
    """Load a data file with the sniffed format's reader."""
    fmt = sniff_format(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.options(**options).json(path)
    if fmt == "txt":
        # one row per line, single `text` column (reference TXT behavior)
        return spark.read.options(**options).text(path).withColumnRenamed("value", "text")
    if fmt == "xlsx":
        try:
            import pandas as pd

            pdf = pd.read_excel(path, **options)
        except ImportError as ex:  # openpyxl/xlrd not in this container
            raise NotImplementedError(
                "xlsx reading requires openpyxl; install it or convert to csv"
            ) from ex
        return spark.createDataFrame(pdf)
    if fmt == "pdf":
        # one row per page, (page, text) — activates when a pdf lib exists
        # (the reference uses pymupdf, file_reader.py:27-214)
        pages = None
        try:
            import pypdf

            reader = pypdf.PdfReader(path)
            pages = [(i + 1, p.extract_text() or "") for i, p in enumerate(reader.pages)]
        except ImportError:
            try:
                import fitz  # pymupdf

                with fitz.open(path) as doc:
                    pages = [(i + 1, page.get_text()) for i, page in enumerate(doc)]
            except ImportError:
                pass
        if pages is None:
            raise NotImplementedError(
                "pdf text extraction requires pypdf or pymupdf; neither is "
                "present in this container (reference: file_reader.py:27-214)"
            )
        return spark.createDataFrame(pages, "page int, text string")
    sep = "\t" if path.endswith(".tsv") else options.pop("sep", ",")
    return (
        spark.read.options(header=True, inferSchema=True, sep=sep, **options).csv(path)
    )
