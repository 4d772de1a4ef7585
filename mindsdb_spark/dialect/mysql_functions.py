"""MySQL → Spark SQL function adaptation table.

Port of the reference's MySQL→DuckDB compat layer
(mindsdb/api/executor/utilities/mysql_to_duckdb_functions.py — per-function
line cites below), retargeted at Spark SQL. Functions MySQL and Spark
already agree on (LOCATE, INSTR, UNHEX, SUBSTRING_INDEX, FROM_UNIXTIME,
DATEDIFF arg order, DAYOFYEAR/DAYOFWEEK/DAYOFMONTH, EXTRACT, TIMESTAMPDIFF,
SHA2) need no rule — Spark's implementations are MySQL-compatible.
"""

from __future__ import annotations

# MySQL DATE_FORMAT %-specifiers → java.time DateTimeFormatter patterns
# (reference strftime remap table: mysql_to_duckdb_functions.py:367-415).
_MYSQL_FMT = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "c": "M",
    "d": "dd",
    "e": "d",
    "H": "HH",
    "k": "H",
    "h": "hh",
    "I": "hh",
    "i": "mm",
    "s": "ss",
    "S": "ss",
    "f": "SSSSSS",
    "p": "a",
    "W": "EEEE",
    "a": "EEE",
    "b": "MMM",
    "M": "MMMM",
    "j": "DDD",
    "T": "HH:mm:ss",
    "r": "hh:mm:ss a",
}


def mysql_format_to_java(fmt: str) -> str:
    """Translate a MySQL %-format string to a DateTimeFormatter pattern,
    quoting literal alphabetic characters."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            if spec == "%":
                out.append("%")
            elif spec in _MYSQL_FMT:
                out.append(_MYSQL_FMT[spec])
            else:
                out.append(f"'{spec}'")
            i += 2
            continue
        if c.isalpha():
            out.append(f"'{c}'")
        else:
            out.append(c)
        i += 1
    return "".join(out)


# GET_FORMAT constant table (reference: mysql_to_duckdb_functions.py:305-364).
_GET_FORMAT = {
    ("DATE", "ISO"): "%Y-%m-%d",
    ("DATE", "USA"): "%m.%d.%Y",
    ("DATE", "JIS"): "%Y-%m-%d",
    ("DATE", "EUR"): "%d.%m.%Y",
    ("DATE", "INTERNAL"): "%Y%m%d",
    ("DATETIME", "ISO"): "%Y-%m-%d %H:%i:%s",
    ("DATETIME", "USA"): "%Y-%m-%d %H.%i.%s",
    ("DATETIME", "JIS"): "%Y-%m-%d %H:%i:%s",
    ("DATETIME", "EUR"): "%Y-%m-%d %H.%i.%s",
    ("DATETIME", "INTERNAL"): "%Y%m%d%H%i%s",
    ("TIME", "ISO"): "%H:%i:%s",
    ("TIME", "USA"): "%h:%i:%s %p",
    ("TIME", "JIS"): "%H:%i:%s",
    ("TIME", "EUR"): "%H.%i.%s",
    ("TIME", "INTERNAL"): "%H%i%s",
}


def _strlit(s: str) -> str:
    return s.strip().strip("'\"")


def _addtime_interval(arg: str) -> str:
    """ADDTIME's 'd hh:mm:ss.f' literal → Spark interval expression
    (reference parse: mysql_to_duckdb_functions.py:570-632)."""
    raw = _strlit(arg)
    neg = raw.startswith("-")
    if neg:
        raw = raw[1:]
    days = "0"
    if " " in raw:
        days, raw = raw.split(" ", 1)
    sign = "-" if neg else ""
    return f"INTERVAL '{sign}{days} {raw}' DAY TO SECOND"


def _is_interval(a: str) -> bool:
    return a.strip().upper().startswith("INTERVAL")


def _group_concat(a: list[str]) -> str:
    import re as _re

    arg, sep = a[0], "','"
    parts = _re.split(r"\s+SEPARATOR\s+", arg, flags=_re.IGNORECASE)
    if len(parts) == 2:
        arg, sep = parts
    distinct = _re.match(r"DISTINCT\s+(.+)$", arg.strip(), _re.IGNORECASE)
    inner = f"collect_list({distinct.group(1)})" if distinct else f"collect_list({arg})"
    if distinct:
        inner = f"array_distinct({inner})"
    return f"concat_ws({sep}, sort_array({inner}))"


def build_rules(session_vars: dict[str, str]) -> dict:
    """Rule table; `session_vars` provides DATABASE()/USER()/VERSION()."""
    db = session_vars.get("database", "mindsdb")
    user = session_vars.get("user", "mindsdb")
    version = session_vars.get("version", "8.0.17-mindsdb-spark")

    rules: dict = {
        # CHAR(a,b,…) → concat(char(a),char(b),…)   (lines 30-56)
        "CHAR": lambda a: "concat(" + ", ".join(f"char({x})" for x in a) + ")",
        # FORMAT(n,d) → format_number                (lines 104-139)
        "FORMAT": lambda a: f"format_number({a[0]}, {a[1]})",
        # LENGTH = bytes in MySQL                    (lines 163-176)
        "LENGTH": lambda a: f"octet_length({a[0]})",
        # REGEXP_SUBSTR → regexp_extract             (lines 179-203)
        "REGEXP_SUBSTR": lambda a: f"regexp_extract({a[0]}, {a[1]}, 0)",
        # CURTIME / CURRENT_TIME                     (lines 239-252)
        "CURTIME": lambda a: "date_format(current_timestamp(), 'HH:mm:ss')",
        "CURRENT_TIME": lambda a: "date_format(current_timestamp(), 'HH:mm:ss')",
        # CURDATE                                    (lines 507-516)
        "CURDATE": lambda a: "current_date()",
        # DAYNAME                                    (lines 493-504)
        "DAYNAME": lambda a: f"date_format(cast({a[0]} as timestamp), 'EEEE')",
        "MONTHNAME": lambda a: f"date_format(cast({a[0]} as timestamp), 'MMMM')",
        # FROM_DAYS: days since year 0               (lines 436-455)
        "FROM_DAYS": lambda a: f"date_add(to_date('0000-01-01'), cast({a[0]} as int))",
        # DATE_FORMAT with %-specifier remap         (lines 367-415)
        "DATE_FORMAT": lambda a: (
            f"date_format(cast({a[0]} as timestamp), "
            f"'{mysql_format_to_java(_strlit(a[1]))}')"
        ),
        # GET_FORMAT → constant                      (lines 305-364)
        "GET_FORMAT": lambda a: "'{}'".format(
            _GET_FORMAT.get((_strlit(a[0]).upper(), _strlit(a[1]).upper()), "%Y-%m-%d")
        ),
        # ADDDATE/DATE_ADD with INTERVAL or day count (lines 536-550)
        "ADDDATE": lambda a: (
            f"(cast({a[0]} as timestamp) + {a[1]})"
            if _is_interval(a[1])
            else f"date_add({a[0]}, {a[1]})"
        ),
        "DATE_ADD": lambda a: (
            f"(cast({a[0]} as timestamp) + {a[1]})"
            if _is_interval(a[1])
            else f"date_add({a[0]}, {a[1]})"
        ),
        # DATE_SUB/SUBDATE                            (lines 553-567)
        "DATE_SUB": lambda a: (
            f"(cast({a[0]} as timestamp) - {a[1]})"
            if _is_interval(a[1])
            else f"date_sub({a[0]}, {a[1]})"
        ),
        "SUBDATE": lambda a: (
            f"(cast({a[0]} as timestamp) - {a[1]})"
            if _is_interval(a[1])
            else f"date_sub({a[0]}, {a[1]})"
        ),
        # ADDTIME                                     (lines 570-632)
        "ADDTIME": lambda a: f"(cast({a[0]} as timestamp) + {_addtime_interval(a[1])})",
        # CONVERT_TZ                                  (lines 635-664)
        "CONVERT_TZ": lambda a: (
            f"from_utc_timestamp(to_utc_timestamp(cast({a[0]} as timestamp), {a[1]}), {a[2]})"
        ),
        # TRUNCATE toward zero                        (sql.py:289-293)
        "TRUNCATE": lambda a: (
            f"(cast({a[0]} * power(10, {a[1] if len(a) > 1 else '0'}) as bigint) "
            f"/ power(10, {a[1] if len(a) > 1 else '0'}))"
        ),
        # session functions                           (sql.py:283-288; subselect_step.py:97-243)
        "DATABASE": lambda a: f"'{db}'",
        "SCHEMA": lambda a: f"'{db}'",
        "USER": lambda a: f"'{user}'",
        "CURRENT_USER": lambda a: f"'{user}'",
        "VERSION": lambda a: f"'{version}'",
        "CONNECTION_ID": lambda a: "1",
        # GROUP_CONCAT([DISTINCT] x [SEPARATOR s]) — MySQL's string
        # aggregate; rendered with a sorted element order so the result is
        # deterministic across engines/partitionings (MySQL without
        # ORDER BY leaves it unspecified)
        "GROUP_CONCAT": _group_concat,
        # JSON path                                   (sql.py:294-295)
        "JSON_EXTRACT": lambda a: f"get_json_object({a[0]}, {a[1]})",
        # engine-defined SQL functions                (query_planner.py:61;
        # interfaces/functions/controller.py:114-189) — registered UDFs
        "LLM": lambda a: f"mindsdb_llm({a[0]})",
        "TO_MARKDOWN": lambda a: f"mindsdb_to_markdown({a[0]})",
        "HASH": lambda a: f"md5({a[0]})",
    }
    return rules


# MySQL %-specifiers → C strftime (the reference's own remap target —
# mysql_to_duckdb_functions.py:367-415 renders DATE_FORMAT as DuckDB
# strftime). Differs from the java.time map above where strftime disagrees:
# %i (MySQL minutes) → %M, %M (MySQL month name) → %B, %W → %A.
_MYSQL_TO_STRFTIME = {
    "Y": "%Y",
    "y": "%y",
    "m": "%m",
    "c": "%-m",
    "d": "%d",
    "e": "%-d",
    "H": "%H",
    "k": "%-H",
    "h": "%I",
    "I": "%I",
    "i": "%M",
    "s": "%S",
    "S": "%S",
    "f": "%f",
    "p": "%p",
    "W": "%A",
    "a": "%a",
    "b": "%b",
    "M": "%B",
    "j": "%j",
    "T": "%H:%M:%S",
    "r": "%I:%M:%S %p",
}


def mysql_format_to_strftime(fmt: str) -> str:
    """Translate a MySQL %-format string to a C strftime pattern."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            if spec == "%":
                out.append("%%")
            else:
                out.append(_MYSQL_TO_STRFTIME.get(spec, spec))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def build_duckdb_rules(session_vars: dict[str, str]) -> dict:
    """MySQL → DuckDB rule table for whole-query pushdown translation.

    The reference renders the parsed query into the SOURCE's dialect before
    pushdown (utilities/render/sqlalchemy_render.py:545-686 +
    mysql_to_duckdb_functions.py); this is the same idea for the functions
    our MySQL shim covers. DELIBERATELY PARTIAL: a function without an entry
    here (LLM/TO_MARKDOWN engine UDFs, CONVERT_TZ, FORMAT, ADDTIME, …)
    blocks pushdown and the query takes the federated Spark plan — a missing
    translation must never become a silent semantic divergence.
    """
    db = session_vars.get("database", "mindsdb")
    user = session_vars.get("user", "mindsdb")
    version = session_vars.get("version", "8.0.17-mindsdb-spark")

    return {
        "CHAR": lambda a: "concat(" + ", ".join(f"chr({x})" for x in a) + ")",
        # LENGTH = bytes in MySQL; DuckDB strlen is byte length
        "LENGTH": lambda a: f"strlen({a[0]})",
        "REGEXP_SUBSTR": lambda a: f"regexp_extract({a[0]}, {a[1]}, 0)",
        "CURTIME": lambda a: "strftime(now(), '%H:%M:%S')",
        "CURRENT_TIME": lambda a: "strftime(now(), '%H:%M:%S')",
        "CURDATE": lambda a: "current_date",
        "DAYNAME": lambda a: f"dayname(CAST({a[0]} AS TIMESTAMP))",
        "MONTHNAME": lambda a: f"monthname(CAST({a[0]} AS TIMESTAMP))",
        "FROM_DAYS": lambda a: f"(DATE '0000-01-01' + CAST({a[0]} AS INT))",
        "DATE_FORMAT": lambda a: (
            f"strftime(CAST({a[0]} AS TIMESTAMP), "
            f"'{mysql_format_to_strftime(_strlit(a[1]))}')"
        ),
        "GET_FORMAT": lambda a: "'{}'".format(
            _GET_FORMAT.get((_strlit(a[0]).upper(), _strlit(a[1]).upper()), "%Y-%m-%d")
        ),
        "ADDDATE": lambda a: (
            f"(CAST({a[0]} AS TIMESTAMP) + {a[1]})"
            if _is_interval(a[1])
            else f"(CAST({a[0]} AS DATE) + CAST({a[1]} AS INT))"
        ),
        "DATE_ADD": lambda a: (
            f"(CAST({a[0]} AS TIMESTAMP) + {a[1]})"
            if _is_interval(a[1])
            else f"(CAST({a[0]} AS DATE) + CAST({a[1]} AS INT))"
        ),
        "DATE_SUB": lambda a: (
            f"(CAST({a[0]} AS TIMESTAMP) - {a[1]})"
            if _is_interval(a[1])
            else f"(CAST({a[0]} AS DATE) - CAST({a[1]} AS INT))"
        ),
        "SUBDATE": lambda a: (
            f"(CAST({a[0]} AS TIMESTAMP) - {a[1]})"
            if _is_interval(a[1])
            else f"(CAST({a[0]} AS DATE) - CAST({a[1]} AS INT))"
        ),
        # DuckDB CAST(double AS BIGINT) ROUNDS (half-even) where Spark's
        # truncates — trunc() is the toward-zero operation here
        "TRUNCATE": lambda a: (
            f"(trunc({a[0]} * power(10, {a[1] if len(a) > 1 else '0'})) "
            f"/ power(10, {a[1] if len(a) > 1 else '0'}))"
        ),
        "DATABASE": lambda a: f"'{db}'",
        "SCHEMA": lambda a: f"'{db}'",
        "USER": lambda a: f"'{user}'",
        "CURRENT_USER": lambda a: f"'{user}'",
        "VERSION": lambda a: f"'{version}'",
        "CONNECTION_ID": lambda a: "1",
        "JSON_EXTRACT": lambda a: f"json_extract({a[0]}, {a[1]})",
        "HASH": lambda a: f"md5({a[0]})",
    }


# @@variables the reference's QueryStep substitutes (subselect_step.py:97-243)
def build_vars(session_vars: dict[str, str]) -> dict[str, str]:
    version = session_vars.get("version", "8.0.17-mindsdb-spark")
    return {
        "version": f"'{version}'",
        "version_comment": "'mindsdb-spark'",
        "autocommit": "1",
        "sql_mode": "'ONLY_FULL_GROUP_BY'",
        "max_allowed_packet": "16777216",
        "session": "NULL",
    }
