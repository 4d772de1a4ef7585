"""Literal-robustness fuzz over the regex command layer (round-3 verdict
item 5): string literals packed with SQL keywords — JOIN/WHERE/(SELECT/
QUALIFY/EXCLUDE/LATEST, quotes, backslashes — must ride through ``sql()``
on every statement family either executing correctly (the literal
round-trips byte-identical) or failing with a clean error; a keyword inside
a literal must never re-route a statement down a different command path.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mindsdb_spark.engine import EngineSession

_settings = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# fragments chosen to collide with every regex dispatcher: join/model
# routing, DML subselect scan, QUALIFY/EXCLUDE rewrites, KB aliasing,
# AND-splitting, LATEST, comment stripping, quote/backslash escapes
_FRAGMENTS = [
    "JOIN model",
    " WHERE x = 1",
    "(SELECT 1)",
    "(select secret",
    "qualify",
    "* EXCLUDE (x)",
    "id",
    "chunk_content",
    "AND y",
    "GROUP BY z",
    "> LATEST",
    "-- comment",
    "# hash",
    "union all",
    "''",
    "it's",
    "back\\slash",
    '"dquote"',
    "evil`tick",
]

_literals = st.lists(
    st.sampled_from(_FRAGMENTS), min_size=1, max_size=4
).map(lambda parts: " ".join(parts))


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "''")


@pytest.fixture(scope="module")
def fsess(spark, sf_dir, tmp_path_factory):
    s = EngineSession(spark)
    s.register_parquet_source("tpch", sf_dir, tables=["nation", "region"])
    s.register_writable_source("whf", str(tmp_path_factory.mktemp("whf")))
    s.sql(
        "CREATE OR REPLACE TABLE whf.fuzz AS SELECT * FROM VALUES "
        "(1, 'seed') AS t(id, note)"
    )
    return s


@_settings
@given(lit=_literals)
def test_select_literal_roundtrips(fsess, lit):
    rows = fsess.sql(
        f"SELECT '{_esc(lit)}' AS lit, n_nationkey FROM tpch_nation "
        "ORDER BY n_nationkey LIMIT 1"
    ).collect()
    assert rows[0]["lit"] == lit


@_settings
@given(lit=_literals)
def test_where_literal_never_matches_or_reroutes(fsess, lit):
    # no nation is named like any fuzz literal → count must be 0; a
    # mis-route would error or return a different shape
    rows = fsess.sql(
        f"SELECT count(*) AS n FROM tpch_nation WHERE n_name = '{_esc(lit)}'"
    ).collect()
    assert rows[0]["n"] == 0


@_settings
@given(lit=_literals)
def test_dml_literal_roundtrips(fsess, lit):
    # UPDATE writes the literal, SELECT reads it back byte-identical,
    # DELETE removes exactly that row by literal equality
    e = _esc(lit)
    n = fsess.sql(f"UPDATE whf.fuzz SET note = '{e}' WHERE id = 1").collect()[0][
        "updated"
    ]
    assert n == 1
    got = fsess.sql("SELECT note FROM whf_fuzz WHERE id = 1").collect()[0]["note"]
    assert got == lit
    fsess.sql(f"INSERT INTO whf.fuzz VALUES (2, '{e}')")
    d = fsess.sql(f"DELETE FROM whf.fuzz WHERE note = '{e}' AND id = 2").collect()[0][
        "deleted"
    ]
    assert d == 1
