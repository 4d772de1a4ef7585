"""Round-10 text-operator scale study at sf100 (5M docs, ~1.5 GB text):
readability / nfc_scrub (round-11 candidates) and mojibake_score (d60,
registered round-10) over the full corpus, Spark vs DuckDB in the same
window, interleaved, 3 samples each.

Both engines consume the operator output through the SAME checksum
aggregate (sums over every output column), which (a) forces all columns
to be computed and (b) doubles as a 5M-doc value-parity check — integer
checksums must match exactly, float checksums to 1e-9 relative (fold
order differs).

The interesting number is nfc_scrub: its NFC step is the repo's one
pandas-UDF-on-text data path, so this measures Arrow-batched Python
throughput against DuckDB's native utf8proc at corpus scale.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SF100_DIR", "/tmp/spark_graft_bench/sf100")


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def main():
    from pyspark.sql import functions as F
    from mindsdb_spark import get_spark
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.text import mojibake_score, nfc_scrub, readability
    from mindsdb_spark.queries.pipeline import D61_SQL, D62_SQL
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(cpus=32, app_name="sf100-r10-text")
    tune_file_partitioning(spark, SF100)
    docs = load_table(spark, SF100, "documents").select("doc_id", "text")

    def spark_checksum(df):
        num = [c for c, t in df.dtypes if t in ("int", "bigint", "double")]
        agg = [F.sum(F.col(c)).alias(c) for c in num]
        for c, t in df.dtypes:
            if t == "boolean":
                agg.append(F.sum(F.col(c).cast("int")).alias(c))
            elif t == "string":
                agg.append(F.sum(F.length(c)).alias(c))
        return df.agg(*agg).collect()[0].asDict()

    ops = {
        "readability": lambda: spark_checksum(readability(docs)),
        "nfc_scrub": lambda: spark_checksum(nfc_scrub(docs)),
        "mojibake_score": lambda: spark_checksum(mojibake_score(docs)),
    }

    out = {"mode": "text_ops_sf100", "sf": 100, "load1": os.getloadavg()[0],
           "n_docs": docs.count()}

    for fn in ops.values():  # warm: codegen + page cache + python workers
        fn()

    samples = {k: [] for k in ops}
    checks = {}
    for _round in range(3):
        for name, fn in ops.items():
            t, chk = timed(fn)
            samples[name].append(t)
            checks[name] = chk
    out["spark_medians"] = {k: round(statistics.median(v), 3) for k, v in samples.items()}
    out["spark_samples"] = samples

    # DuckDB leg: identical checksum aggregates over the operator SQL
    # (candidate oracles minus their seeded VALUES rows — corpus only)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text FROM "
        f"read_parquet('{SF100}/documents.parquet/*.parquet')"
    )
    d61_body = D61_SQL.replace("ORDER BY doc_id", "")
    import re as _re

    d62_body = _re.sub(
        r"UNION ALL SELECT \* FROM \(VALUES.*?AS d\(doc_id, text\)", "",
        D62_SQL, flags=_re.S,
    ).replace("ORDER BY doc_id", "")
    assert "VALUES" not in d62_body, "seed strip failed"
    from mindsdb_spark.operators.text import (
        C1_CONTROLS, MOJIBAKE_2BYTE, MOJIBAKE_3BYTE, REPLACEMENT_CHAR,
    )

    def q(s):
        return "'" + s.replace("'", "''") + "'"

    cnt = {k: f"len(regexp_extract_all(coalesce(text,''), {q(v)}))" for k, v in
           [("m2", MOJIBAKE_2BYTE), ("m3", MOJIBAKE_3BYTE),
            ("c1", C1_CONTROLS), ("rep", REPLACEMENT_CHAR)]}
    total = f"({cnt['m2']}*2 + {cnt['m3']}*2 + {cnt['c1']} + {cnt['rep']})"
    duck_sql = {
        "readability": f"SELECT sum(n_words), sum(n_sentences), sum(n_syllables), "
                       f"sum(flesch), sum(fk_grade) FROM ({d61_body})",
        "nfc_scrub": f"SELECT sum(CAST(changed AS INT)), sum(length(clean_text)) "
                     f"FROM ({d62_body})",
        "mojibake_score": f"SELECT sum({cnt['m2']}), sum({cnt['m3']}), sum({cnt['c1']}), "
                          f"sum({cnt['rep']}), "
                          f"sum(coalesce(floor({total} * 1000.0 / nullif(length(coalesce(text,'')), 0) * 1000000 + 0.5) / 1000000, 0.0)), "
                          f"sum(CAST({total} > 0 AS INT)) FROM documents",
    }
    du_samples = {k: [] for k in duck_sql}
    du_checks = {}
    for sql in duck_sql.values():
        con.execute(sql).fetchall()  # warm
    for _round in range(3):
        for name, sql in duck_sql.items():
            t, rows = timed(lambda: con.execute(sql).fetchall())
            du_samples[name].append(t)
            du_checks[name] = rows[0]
    out["duckdb_medians"] = {k: round(statistics.median(v), 3) for k, v in du_samples.items()}
    out["duckdb_samples"] = du_samples
    out["ratios"] = {
        k: round(out["spark_medians"][k] / out["duckdb_medians"][k], 3)
        for k in ops
    }

    # cross-engine checksum parity at 5M docs
    def close(a, b):
        if a is None or b is None:
            return a == b
        a, b = float(a), float(b)
        # integer checksums compare exactly under this bound; float sums
        # over 5M addends get 5e-7 relative headroom for fold-order error
        return abs(a - b) <= 5e-7 * max(1.0, abs(a), abs(b))

    parity = {}
    parity["readability"] = all(close(a, b) for a, b in zip(
        [checks["readability"][c] for c in
         ("n_words", "n_sentences", "n_syllables", "flesch", "fk_grade")],
        du_checks["readability"]))
    parity["nfc_scrub"] = all(close(a, b) for a, b in zip(
        [checks["nfc_scrub"][c] for c in ("changed", "clean_text")],
        du_checks["nfc_scrub"]))
    parity["mojibake_score"] = all(close(a, b) for a, b in zip(
        [checks["mojibake_score"][c] for c in
         ("n_moj2", "n_moj3", "n_c1", "n_replacement",
          "damage_per_kchar", "is_suspect")],
        du_checks["mojibake_score"]))
    out["checksum_parity_5m_docs"] = parity
    out["spark_checksums"] = {k: {c: (float(v) if v is not None else None)
                                  for c, v in chk.items()}
                              for k, chk in checks.items()}
    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
