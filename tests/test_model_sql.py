"""`table JOIN model` through the SQL door (reference:
plan_join.py:760-818 planning, apply_predictor_step.py:103-233 execution,
query_planner.py:569-648 condition split into model params)."""

import pandas as pd
import pytest

from mindsdb_spark.engine import EngineSession, _split_and
from mindsdb_spark.operators.model import ModelSpec


@pytest.fixture(scope="module")
def sess(spark, sf_dir):
    s = EngineSession(spark)
    s.register_parquet_source("tpch", sf_dir, tables=["orders", "customer", "events"])

    def predict(pdf):
        scale = float(pdf["scale"].iloc[0]) if "scale" in pdf.columns else 1.0
        risk = (pdf["o_totalprice"] / 500000.0 * scale).clip(upper=1.0)
        return pd.DataFrame({"risk": risk, "band": risk.map(lambda r: "hi" if r > 0.5 else "lo")})

    s.register_model(ModelSpec(name="riskm", predict=predict, output_schema="risk double, band string"))
    return s


def test_split_and():
    assert _split_and("a = 1 AND b > 2") == ["a = 1", "b > 2"]
    assert _split_and("a = 'x AND y' AND (b = 1 AND c = 2)") == ["a = 'x AND y'", "(b = 1 AND c = 2)"]


def test_model_join_basic(sess):
    df = sess.sql(
        "SELECT t.o_orderkey, m.risk, m.band FROM tpch_orders t JOIN riskm m "
        "WHERE t.o_orderkey <= 10 ORDER BY t.o_orderkey"
    )
    rows = df.collect()
    assert [r["o_orderkey"] for r in rows] == sorted(r["o_orderkey"] for r in rows)
    assert all(r["band"] in ("hi", "lo") for r in rows)
    assert set(df.columns) == {"o_orderkey", "risk", "band"}


def test_model_join_without_aliases(sess):
    df = sess.sql("SELECT o_orderkey, risk FROM tpch_orders JOIN riskm WHERE o_orderkey <= 5")
    expected = sess.sql("SELECT COUNT(*) FROM tpch_orders WHERE o_orderkey <= 5").collect()[0][0]
    assert df.count() == expected > 0


def test_model_param_from_where_equality(sess):
    # scale is not a table column; `m.scale = 2.0` becomes a model param
    # (the reference's row_dict) visible to predict() as a constant column
    base = {r["o_orderkey"]: r["risk"] for r in sess.sql(
        "SELECT t.o_orderkey, m.risk FROM tpch_orders t JOIN riskm m WHERE t.o_orderkey <= 5"
    ).collect()}
    scaled = {r["o_orderkey"]: r["risk"] for r in sess.sql(
        "SELECT t.o_orderkey, m.risk FROM tpch_orders t JOIN riskm m "
        "WHERE t.o_orderkey <= 5 AND m.scale = 2.0"
    ).collect()}
    for k in base:
        assert scaled[k] == pytest.approx(min(base[k] * 2.0, 1.0))


def test_model_output_condition_filters_after_apply(sess):
    rows = sess.sql(
        "SELECT t.o_orderkey, m.risk FROM tpch_orders t JOIN riskm m "
        "WHERE t.o_orderkey <= 100 AND m.risk > 0.5"
    ).collect()
    assert all(r["risk"] > 0.5 for r in rows)


def test_model_join_group_by(sess):
    rows = sess.sql(
        "SELECT m.band, COUNT(*) AS cnt FROM tpch_orders t JOIN riskm m "
        "WHERE t.o_orderkey <= 1000 GROUP BY m.band ORDER BY m.band"
    ).collect()
    expected = sess.sql("SELECT COUNT(*) FROM tpch_orders WHERE o_orderkey <= 1000").collect()[0][0]
    assert sum(r["cnt"] for r in rows) == expected > 0
    assert [r["band"] for r in rows] == sorted(r["band"] for r in rows)


def test_ts_model_join(sess):
    def forecast(pdf):
        base = float(pdf["value"].mean())
        return pd.DataFrame({"user_id": [int(pdf["user_id"].iloc[0])] * 2,
                             "h": [1, 2], "value_pred": [base] * 2})

    sess.register_model(ModelSpec(
        name="fcast", predict=forecast,
        output_schema="user_id long, h int, value_pred double",
        order_by=["ts", "event_id"], group_by=["user_id"], window=3, horizon=2,
    ))
    rows = sess.sql(
        "SELECT m.user_id, m.h, m.value_pred FROM tpch_events t JOIN fcast m "
        "ORDER BY m.user_id, m.h"
    ).collect()
    assert len(rows) > 0 and len(rows) % 2 == 0
    assert rows[0]["h"] == 1 and rows[1]["h"] == 2


def test_plain_join_unaffected(sess):
    rows = sess.sql(
        "SELECT COUNT(*) AS c FROM tpch_orders o JOIN tpch_customer c "
        "ON o.o_custkey = c.c_custkey"
    ).collect()
    assert rows[0][0] > 0


def test_show_and_drop_model(sess):
    names = [r[0] for r in sess.sql("SHOW MODELS").collect()]
    assert "riskm" in names
    sess.register_model(ModelSpec(name="tmp", predict=lambda p: p, output_schema="x int"))
    sess.sql("DROP MODEL tmp")
    assert "tmp" not in [r[0] for r in sess.sql("SHOW MODELS").collect()]


def test_one_shot_model_select(sess):
    """`SELECT <cols> FROM <model> WHERE a = 1 AND b = 'x'` — predictor-only
    FROM applies the model to the WHERE equality dict as a one-row input
    (reference: sql_query.py:148-161)."""
    row = sess.sql(
        "SELECT risk, band FROM riskm WHERE o_totalprice = 250000"
    ).collect()[0]
    assert row["risk"] == 0.5 and row["band"] == "lo"
    # extra inputs pass through to the predictor (scale halves the risk...
    # doubles it here: 250000/500000 * 2 = 1.0 -> 'hi')
    row = sess.sql(
        "SELECT * FROM riskm WHERE o_totalprice = 250000 AND scale = 2.0"
    ).collect()[0]
    assert row["risk"] == 1.0 and row["band"] == "hi"
    # a non-equality WHERE is not the one-shot form: falls through (and, for
    # a model-only FROM, fails like any unknown table would)
    import pytest as _pytest

    with _pytest.raises(Exception):
        sess.sql("SELECT risk FROM riskm WHERE o_totalprice > 5").collect()


def test_one_shot_prediction_cache(sess):
    # bounded cache on (model, version, input row) — the reference's
    # predictor cache (apply_predictor_step.py:177-186); model mutations
    # invalidate
    sess._predict_cache.clear()
    r1 = sess.sql("SELECT risk FROM riskm WHERE o_totalprice = 250000").collect()
    assert len(sess._predict_cache) == 1
    r2 = sess.sql("SELECT risk FROM riskm WHERE o_totalprice = 250000").collect()
    assert r1 == r2 and len(sess._predict_cache) == 1
    sess.sql("SELECT risk FROM riskm WHERE o_totalprice = 100000").collect()
    assert len(sess._predict_cache) == 2
    sess._add_model_version("riskm", sess._models["riskm"])
    assert len(sess._predict_cache) == 0


def test_model_join_on_column_mapping(spark, sf_dir):
    # reference test_models.py:118-152: `JOIN model m ON m.input = t.col`
    # feeds the table column to the model under its input name
    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["customer"])
    sess.sql(
        "CREATE MODEL mj_map (SELECT c_acctbal AS x, c_acctbal * 2 AS y "
        "FROM tpch_customer) PREDICT y USING engine = 'spark_ml_linreg'"
    )
    # model trained on input column `x`; table provides it as c_acctbal
    rows = sess.sql(
        "SELECT t.c_custkey, m.y FROM tpch_customer t JOIN mj_map m "
        "ON m.x = t.c_acctbal ORDER BY t.c_custkey LIMIT 5"
    ).collect()
    assert len(rows) == 5 and all(r["y"] is not None for r in rows)
    # mapping an EXPRESSION also works
    rows2 = sess.sql(
        "SELECT t.c_custkey, m.y FROM tpch_customer t JOIN mj_map m "
        "ON m.x = t.c_acctbal + 0 ORDER BY t.c_custkey LIMIT 5"
    ).collect()
    assert [round(a["y"], 4) for a in rows] == [round(b["y"], 4) for b in rows2]
    sess.sql("DROP MODEL mj_map")


def test_model_join_partition_size(spark, sf_dir):
    # reference test_models.py:153-187: `JOIN model USING partition_size=N`
    # bounds each model call's input; output rows are unchanged
    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["customer"])
    sess.sql(
        "CREATE MODEL mj_part (SELECT c_acctbal AS x, c_acctbal * 2 AS y "
        "FROM tpch_customer) PREDICT y USING engine = 'spark_ml_linreg'"
    )
    base = sess.sql(
        "SELECT t.c_custkey, m.y FROM tpch_customer t JOIN mj_part m "
        "ON m.x = t.c_acctbal ORDER BY t.c_custkey"
    ).collect()
    part = sess.sql(
        "SELECT t.c_custkey, m.y FROM tpch_customer t JOIN mj_part m "
        "ON m.x = t.c_acctbal USING partition_size = 7 ORDER BY t.c_custkey"
    ).collect()
    assert len(base) == len(part)
    assert [round(r["y"], 6) for r in base] == [round(r["y"], 6) for r in part]
    sess.sql("DROP MODEL mj_part")


def test_model_join_nested_tableau_shape(spark, sf_dir):
    # reference test_executor.py:1172-1229: aggregate over a derived table
    # whose body is a model join, backquoted alias, HAVING w/o GROUP BY
    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["customer"])
    sess.sql(
        "CREATE MODEL mj_nest (SELECT c_acctbal AS x, c_acctbal * 2 AS y "
        "FROM tpch_customer) PREDICT y USING engine = 'spark_ml_linreg'"
    )
    row = sess.sql(
        "SELECT SUM(1) AS cnt, max(`Custom SQL Query`.`y`) AS max_pred "
        "FROM (SELECT t.c_custkey, m.y FROM tpch_customer t "
        "      JOIN mj_nest m ON m.x = t.c_acctbal) `Custom SQL Query` "
        "HAVING (COUNT(1) > 0)"
    ).collect()[0]
    assert row["cnt"] > 0 and row["max_pred"] is not None
    sess.sql("DROP MODEL mj_nest")


def test_model_predict_time_using_params(spark, sf_dir):
    # reference test_predictor_params.py: `USING p1 = 'a', p2 = {...}`
    # after WHERE reaches predict (here as constant input-frame columns)
    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["customer"])
    # predict runs on executors: ECHO the received params into the output
    def probe_predict(pdf):
        import pandas as pd
        ok = (
            "p1" in pdf.columns and "p2" in pdf.columns
            and len(pdf) > 0 and pdf["p1"].iloc[0] == "a"
            and pdf["p2"].iloc[0] == {"x": 1, "y": 2}
        )
        return pd.DataFrame({"p": [1.0 if ok else 0.0] * len(pdf)})

    from mindsdb_spark.operators.model import ModelSpec
    sess.register_model(ModelSpec(name="pm", predict=probe_predict, output_schema="p double"))
    rows = sess.sql(
        "SELECT t.c_custkey, m.p FROM tpch_customer t JOIN pm m "
        "WHERE t.c_custkey < 5 USING p1 = 'a', p2 = {'x': 1, 'y': 2}"
    ).collect()
    assert len(rows) > 0 and all(r["p"] == 1.0 for r in rows)


def test_multi_model_batch_join(spark, sf_dir):
    # get-batch-predictions.mdx:17-23 — several models joined in one
    # statement; each model's outputs are alias-scoped
    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir)
    sess.sql("CREATE MODEL mm1 (SELECT c_acctbal AS pred, c_custkey, c_nationkey "
             "FROM tpch_customer) PREDICT pred USING engine = 'spark_ml_linreg'")
    sess.sql("CREATE MODEL mm2 (SELECT c_nationkey AS cl, c_custkey, c_acctbal "
             "FROM tpch_customer) PREDICT cl USING engine = 'spark_ml_kmeans'")
    rows = sess.sql(
        "SELECT t.c_custkey, m1.pred AS p1, m2.cl AS cluster "
        "FROM tpch_customer AS t JOIN mindsdb.mm1 AS m1 JOIN mindsdb.mm2 AS m2 "
        "WHERE t.c_custkey < 50 ORDER BY t.c_custkey LIMIT 4"
    ).collect()
    assert len(rows) == 4
    assert all(r["p1"] is not None and r["cluster"] is not None for r in rows)
    assert [r["c_custkey"] for r in rows] == sorted(r["c_custkey"] for r in rows)
    # ordinary multi-table joins must NOT be hijacked by the model path
    n = sess.sql(
        "SELECT count(*) AS n FROM tpch_region JOIN tpch_nation "
        "ON r_regionkey = n_regionkey JOIN tpch_customer ON n_nationkey = c_nationkey"
    ).collect()[0]["n"]
    assert n > 0
    sess.sql("DROP MODEL mm1"); sess.sql("DROP MODEL mm2")


def test_single_prediction_explain_column(spark, sf_dir):
    # get-single-prediction.mdx: `SELECT target, target_explain FROM model
    # WHERE input = value` — the explain JSON carries predicted_value and
    # honest-NULL confidence fields for engines that don't estimate them
    import json as _json

    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir)
    sess.sql("CREATE MODEL sxm (SELECT c_acctbal AS pred, c_custkey, c_nationkey "
             "FROM tpch_customer) PREDICT pred USING engine = 'spark_ml_linreg'")
    r = sess.sql(
        "SELECT pred, pred_explain FROM mindsdb.sxm "
        "WHERE c_custkey = 7 AND c_nationkey = 3"
    ).collect()[0]
    exp = _json.loads(r["pred_explain"])
    assert exp["predicted_value"] == r["pred"]
    assert "confidence" in exp
    sess.sql("DROP MODEL sxm")


def test_describe_model_keyword_optional_and_attrs(spark, sf_dir):
    # api/describe.mdx: `DESCRIBE [MODEL] name[.attribute]` with the full
    # attribute set; plain table DESCRIBE is untouched
    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir)
    sess.sql("CREATE MODEL ddm (SELECT c_acctbal AS pred, c_custkey, c_nationkey "
             "FROM tpch_customer) PREDICT pred USING engine = 'spark_ml_linreg'")
    assert sess.sql("DESCRIBE ddm").collect()[0]["name"] == "ddm"
    assert sess.sql("DESCRIBE ddm.features").count() >= 1
    args = {r["key"]: r["value"] for r in sess.sql("DESCRIBE MODEL ddm.args").collect()}
    assert args.get("engine") == "spark_ml_linreg"
    assert sess.sql("DESCRIBE MODEL ddm.metadata").columns == ["attribute", "value"]
    # table describe still answers the MySQL column shape
    assert sess.sql("DESCRIBE region").columns[:2] == ["Field", "Type"]
    # explicit MODEL keyword + missing model = clean not-found (reference
    # command_executor.py:931), not a Spark table-resolution error
    with pytest.raises(KeyError, match="does not exist"):
        sess.sql("DESCRIBE MODEL no_such_model")
    sess.sql("DROP MODEL ddm")


def test_ts_model_join_latest(sess):
    # `WHERE t.<time col> > LATEST` (reference plan_join_ts.py:266-276):
    # forecast-only output; a group filter rides into the window fetch
    rows = sess.sql(
        "SELECT m.user_id, m.h FROM tpch_events t JOIN fcast m "
        "WHERE t.ts > LATEST AND t.user_id < 5 ORDER BY m.user_id, m.h"
    ).collect()
    assert rows and all(r["user_id"] < 5 for r in rows)
    assert len(rows) % 2 == 0  # horizon rows only
    # `= LATEST` (reference apply_predictor_step.py apply_ts_filter,
    # op_map '=' vs Latest): ONLY the first forecast step per group — one
    # row, not the whole horizon
    eq_rows = sess.sql(
        "SELECT m.user_id, m.h FROM tpch_events t JOIN fcast m "
        "WHERE t.ts = LATEST AND t.user_id < 5 ORDER BY m.user_id"
    ).collect()
    assert eq_rows and all(r["h"] == 1 for r in eq_rows)
    assert len(eq_rows) == len(rows) // 2  # one row per group vs horizon=2
    assert [r["user_id"] for r in eq_rows] == sorted(
        {r["user_id"] for r in rows}
    )
    # LATEST anywhere else is a planning error, as in the reference
    with pytest.raises(ValueError, match="LATEST"):
        sess.sql(
            "SELECT m.user_id FROM tpch_events t JOIN fcast m WHERE t.value > LATEST"
        )


def test_multi_model_join_output_collision_errors(spark, sf_dir):
    # round-3 advice: an output column shadowing an input column used to be
    # silently skipped by the column-set-diff rename — now a clear error
    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir)
    sess.sql("CREATE MODEL mc1 (SELECT c_acctbal, c_custkey, c_nationkey "
             "FROM tpch_customer) PREDICT c_acctbal USING engine = 'spark_ml_linreg'")
    sess.sql("CREATE MODEL mc2 (SELECT c_nationkey AS cl, c_custkey, c_acctbal "
             "FROM tpch_customer) PREDICT cl USING engine = 'spark_ml_kmeans'")
    with pytest.raises(ValueError, match="collide"):
        sess.sql(
            "SELECT t.c_custkey, m1.c_acctbal, m2.cl "
            "FROM tpch_customer AS t JOIN mindsdb.mc1 AS m1 JOIN mindsdb.mc2 AS m2"
        )
    sess.sql("DROP MODEL mc1"); sess.sql("DROP MODEL mc2")
