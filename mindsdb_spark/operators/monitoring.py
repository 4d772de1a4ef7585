"""Model/data monitoring operators: distribution-drift detection between a
baseline (training-window) population and a current (serving-window) one.

The reference ships model management (CREATE/RETRAIN/FINETUNE, versions)
but no drift monitoring — the operational trigger for RETRAIN. PSI is the
standard scorecard-monitoring statistic (rule of thumb: < 0.1 stable,
0.1–0.25 drifting, > 0.25 retrain); it is pure counting, so the DuckDB
oracle reproduces it exactly.

Scale posture: the bin edges are ONE 2-scalar aggregate riding a 1-row
broadcast (no collect); each side is then a single map stage into an
n_bins-row aggregate. Join/aggregate state is bounded by n_bins regardless
of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

col = F.col

_EPS = 1e-6  # zero-share clamp — keeps ln finite, spelled identically in SQL


def _round6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def psi_drift(
    base: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between ``base`` and ``cur`` on
    ``value_col``: equal-width bins over the BASELINE min/max (the
    scorecard-monitoring recipe — the grid is fixed at training time),
    out-of-range current values clamped into the edge bins, shares floored
    at 1e-6, per-bin psi = (p_cur − p_base)·ln(p_cur/p_base).

    Returns one row per occupied bin: (bin, n_base, n_cur, p_base, p_cur,
    psi), shares and psi rounded to 1e-6. Total PSI = sum(psi). Requires a
    non-degenerate baseline (min < max).
    """
    edges = base.agg(
        F.min(value_col).cast("double").alias("__lo"),
        F.max(value_col).cast("double").alias("__hi"),
    )

    def binned(df: DataFrame) -> DataFrame:
        width = (col("__hi") - col("__lo")) / F.lit(float(n_bins))
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((col(value_col) - col("__lo")) / width).cast("int"),
            ),
        )
        return df.crossJoin(F.broadcast(edges)).select(b.alias("bin"))

    pb = binned(base).groupBy("bin").agg(F.count("*").alias("n_base"))
    pc = binned(cur).groupBy("bin").agg(F.count("*").alias("n_cur"))
    j = (
        pb.join(pc, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    totals = j.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_cur").alias("__tc")
    )
    p_base = F.greatest(col("n_base") / col("__tb"), F.lit(_EPS))
    p_cur = F.greatest(col("n_cur") / col("__tc"), F.lit(_EPS))
    psi = (p_cur - p_base) * F.log(p_cur / p_base)
    return (
        j.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            col("n_base").cast("long").alias("n_base"),
            col("n_cur").cast("long").alias("n_cur"),
            _round6(p_base).alias("p_base"),
            _round6(p_cur).alias("p_cur"),
            _round6(psi).alias("psi"),
        )
    )


def categorical_drift(
    base: DataFrame,
    cur: DataFrame,
    value_col: str,
) -> DataFrame:
    """PSI over categorical shares: one row per category value observed in
    either window, same clamp/psi formula as the binned numeric form.
    Category cardinality bounds all join/aggregate state; shuffles key on
    the category value.
    """
    pb = base.groupBy(col(value_col).alias("category")).agg(
        F.count("*").alias("n_base")
    )
    pc = cur.groupBy(col(value_col).alias("category")).agg(
        F.count("*").alias("n_cur")
    )
    j = pb.join(pc, "category", "full_outer").select(
        "category",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    totals = j.agg(F.sum("n_base").alias("__tb"), F.sum("n_cur").alias("__tc"))
    p_base = F.greatest(col("n_base") / col("__tb"), F.lit(_EPS))
    p_cur = F.greatest(col("n_cur") / col("__tc"), F.lit(_EPS))
    psi = (p_cur - p_base) * F.log(p_cur / p_base)
    return j.crossJoin(F.broadcast(totals)).select(
        "category",
        col("n_base").cast("long").alias("n_base"),
        col("n_cur").cast("long").alias("n_cur"),
        _round6(p_base).alias("p_base"),
        _round6(p_cur).alias("p_cur"),
        _round6(psi).alias("psi"),
    )
