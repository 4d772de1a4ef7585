"""SQL-text function rewriter.

The reference adapts MySQL-dialect functions for its DuckDB executor with a
per-function rewrite table (reference:
mindsdb/api/executor/utilities/mysql_to_duckdb_functions.py:678-712). We do
the same MySQL → Spark SQL adaptation, but on the SQL text itself: a small
scanner finds function calls outside string literals, splits their
top-level arguments, recursively rewrites them, and applies the rule.

This is intentionally *not* a SQL parser — Spark's parser handles the
grammar; the rewriter only needs to relocate function spellings, which is
exactly the role the reference's SQLAlchemy-level adapter plays.
"""

from __future__ import annotations

import re
from collections.abc import Callable

# rule: (args: list[str]) -> replacement SQL
Rule = Callable[[list[str]], str]


def split_top_level(body: str) -> list[str]:
    """Public alias of the top-level comma splitter (used by the engine's
    UPDATE ... SET parser)."""
    return _split_args(body)


def _skip_string(sql: str, i: int, quote: str) -> int:
    """Return index just past the literal starting at sql[i] == quote."""
    i += 1
    while i < len(sql):
        if sql[i] == "\\" and quote == "'":
            i += 2
            continue
        if sql[i] == quote:
            if i + 1 < len(sql) and sql[i + 1] == quote:  # '' escape
                i += 2
                continue
            return i + 1
        i += 1
    return i


def strip_mysql_comments(sql: str) -> str:
    """Remove MySQL ``#``-to-end-of-line comments. The reference's parser
    accepts them (MySQL dialect); Spark SQL only knows ``--`` and block
    comments, so they are stripped before any command matching or rewrite.
    String literals and backtick identifiers are preserved."""
    if "#" not in sql:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in ("'", '"', "`"):
            j = _skip_string(sql, i, c)
            out.append(sql[i:j])
            i = j
            continue
        if c == "#":
            while i < n and sql[i] != "\n":
                i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _split_args(body: str) -> list[str]:
    """Split a parenthesized body on top-level commas, respecting nesting
    (parens, braces, brackets — JSON-object USING values) and string
    literals."""
    args, depth, cur, i = [], 0, [], 0
    while i < len(body):
        c = body[i]
        if c in ("'", '"'):
            j = _skip_string(body, i, c)
            cur.append(body[i:j])
            i = j
            continue
        if c in "({[":
            depth += 1
        elif c in ")}]":
            depth -= 1
        elif c == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail or args:
        args.append(tail)
    return args


def rewrite_sql(sql: str, rules: dict[str, Rule], vars_: dict[str, str] | None = None) -> str:
    """Rewrite every FUNC(args...) whose upper-cased name is in `rules`.

    `vars_` maps @@variable names (lowercase, without @@) to literal SQL.
    """
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            j = _skip_string(sql, i, c)
            out.append(sql[i:j])
            i = j
            continue
        if c == "@" and i + 1 < n and sql[i + 1] == "@":
            j = i + 2
            while j < n and (sql[j].isalnum() or sql[j] in "._"):
                j += 1
            name = sql[i + 2 : j].lower().split(".")[-1]
            if vars_ and name in vars_:
                out.append(vars_[name])
            else:
                out.append("NULL")
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            ident = sql[i:j]
            # lookahead for '('
            k = j
            while k < n and sql[k] in " \t\r\n":
                k += 1
            if k < n and sql[k] == "(" and ident.upper() in rules:
                # find matching close paren
                depth, m = 0, k
                while m < n:
                    ch = sql[m]
                    if ch in ("'", '"'):
                        m = _skip_string(sql, m, ch)
                        continue
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    m += 1
                body = sql[k + 1 : m]
                args = [rewrite_sql(a, rules, vars_) for a in _split_args(body)]
                out.append(rules[ident.upper()](args))
                i = m + 1
                continue
            out.append(ident)
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


_QUALIFY_TERMINATORS = ("ORDER", "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT")


def sub_outside_strings(pattern: str, repl: str, text: str, flags: int = 0) -> str:
    """``re.sub`` applied only to segments outside quoted string literals —
    identifiers (including backticked ones) are still rewritten, but a
    literal like ``'document id 5'`` is never mutated (round-3 advice:
    _kb_alias and the star-EXCLUDE rewrite corrupted literals)."""
    out, i, n, start = [], 0, len(text), 0
    while i < n:
        c = text[i]
        if c in ("'", '"'):
            out.append(re.sub(pattern, repl, text[start:i], flags=flags))
            j = _skip_string(text, i, c)
            out.append(text[i:j])
            i = start = j
        else:
            i += 1
    out.append(re.sub(pattern, repl, text[start:], flags=flags))
    return "".join(out)


def _scan_top_level_words(sql: str):
    """Yield (index, upper_word) for every bare word at paren depth 0,
    outside string literals and backtick identifiers."""
    depth, i, n = 0, 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            i = _skip_string(sql, i, c)
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if depth == 0 and (c.isalpha() or c == "_"):
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            yield i, sql[i:j].upper()
            i = j
            continue
        i += 1


def rewrite_qualify(sql: str) -> str:
    """QUALIFY clause support: DuckDB (the reference's internal executor)
    accepts `... QUALIFY <window predicate>`; Spark has no QUALIFY, so the
    clause rewrites to the standard subquery form —

        SELECT * EXCEPT (__qualify__) FROM (
            SELECT <targets>, (<pred>) AS __qualify__ <rest-of-query>
        ) WHERE __qualify__ <order/limit tail>

    — which is semantically what QUALIFY means (filter after window
    evaluation, before ORDER BY/LIMIT). Top-level QUALIFY only; set
    operations around it and DISTINCT targets are refused with a clear
    error rather than silently changing semantics.
    """
    words = list(_scan_top_level_words(sql))
    froms_all = [i for i, w in words if w == "FROM"]
    # a QUALIFY clause can only follow the FROM — a bare identifier named
    # `qualify` in the projection must not trigger the rewrite
    q = [
        (i, w)
        for i, w in words
        if w == "QUALIFY" and froms_all and i > froms_all[0]
    ]
    if not q:
        return sql
    if len(q) > 1:
        raise ValueError("multiple top-level QUALIFY clauses are not supported")
    qi, _ = q[0]

    def _is_star_except(idx: int) -> bool:
        # `* EXCEPT (cols)` / `t.* EXCEPT (cols)` is a projection modifier,
        # not a set operation — recognized by the `*` immediately before
        return sql[:idx].rstrip().endswith("*")

    if any(
        w in ("UNION", "INTERSECT") or (w == "EXCEPT" and not _is_star_except(i))
        for i, w in words
        if i < qi
    ):
        raise ValueError("QUALIFY combined with set operations is not supported")
    selects = [i for i, w in words if w == "SELECT"]
    froms = [i for i in froms_all if i < qi]
    if not selects or not froms:
        raise ValueError("QUALIFY requires a SELECT ... FROM query")
    sel_i = selects[0]
    from_i = froms[0]
    if any(w == "DISTINCT" and sel_i < i < from_i for i, w in words):
        raise ValueError("QUALIFY with SELECT DISTINCT is not supported")
    # predicate runs until the first top-level terminator after QUALIFY
    tail_i = len(sql)
    for i, w in words:
        if i > qi and w in _QUALIFY_TERMINATORS:
            tail_i = i
            break
    pred = sql[qi + len("QUALIFY"):tail_i].strip().rstrip(";")
    tail = sql[tail_i:].strip()
    inner = (
        sql[:from_i].rstrip()
        + f", ({pred}) AS __qualify__ "
        + sql[from_i:qi].strip()
    )
    out = f"SELECT * EXCEPT (__qualify__) FROM ({inner}) WHERE __qualify__"
    if tail:
        out += " " + tail
    return out
