"""Online-serving surface (SURVEY.md §3.3): the stdlib-HTTP ModelServer
must reproduce the reference Flask contract — load-once model, POST
/predict with validated/coerced JSON, round(x, 2) payload, 400 on bad
input — and agree with the library predict_one path."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.ml.serving import (
    ModelServer,
    coerce_request,
    load_model,
    predict_one,
)
from nyc_taxi_etl_pyspark_spark.ml.trainer import train_gbt_regressor
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

REQUIRED = {"x1": float, "x2": int}


@pytest.fixture(scope="module")
def model(spark, sf_dir, tmp_path_factory):
    orders = load_table(spark, sf_dir, "orders")
    feats = orders.select(
        F.col("o_totalprice").alias("y"),
        (F.col("o_totalprice") / 1000.0).alias("x1"),
        (F.col("o_orderkey") % 7).cast("int").alias("x2"),
    )
    result = train_gbt_regressor(
        feats, label_col="y", numeric_features=["x1", "x2"], max_iter=3
    )
    path = str(tmp_path_factory.mktemp("m") / "model")
    result.model.write().overwrite().save(path)
    return load_model(path)  # exercise the model-source path too


def _post(url: str, payload: dict):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.load(resp)


def test_server_predicts_and_matches_library_path(spark, model):
    features = {"x1": 42.5, "x2": 3}
    with ModelServer(spark, model, REQUIRED) as srv:
        host, port = srv.addr
        status, body = _post(f"http://{host}:{port}/predict", features)
    assert status == 200
    want = round(predict_one(spark, model, features), 2)
    assert body == {"prediction": want}


def test_server_rejects_bad_requests(spark, model):
    with ModelServer(spark, model, REQUIRED) as srv:
        host, port = srv.addr
        url = f"http://{host}:{port}/predict"
        for payload, expect in [
            ({"x1": 1.0}, 400),  # missing field
            ({"x1": "nope", "x2": 1}, 400),  # uncoercible
        ]:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(url, payload)
            assert e.value.code == expect
            assert "error" in json.load(e.value)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"http://{host}:{port}/other", {})
        assert e.value.code == 404


def test_server_scoring_failure_returns_500(spark, model):
    """A request that validates but cannot be scored (the declared
    required fields don't match the model's feature columns) must return
    the reference's 500 contract, not crash the server."""
    with ModelServer(spark, model, {"wrong_feature": float}) as srv:
        host, port = srv.addr
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"http://{host}:{port}/predict", {"wrong_feature": 1.0})
        assert e.value.code == 500
        assert "error" in json.load(e.value)
        # server survives the failure: a good request still succeeds
    with ModelServer(spark, model, REQUIRED) as srv:
        host, port = srv.addr
        status, _ = _post(
            f"http://{host}:{port}/predict", {"x1": 1.0, "x2": 2}
        )
        assert status == 200


def test_non_object_json_body_returns_400(spark, model):
    """ADVICE r3: a valid-JSON but non-object body (5, null, [1]) must
    get the documented 400, not a dropped connection from a TypeError
    in the handler thread."""
    with ModelServer(spark, model, REQUIRED) as srv:
        host, port = srv.addr
        url = f"http://{host}:{port}/predict"
        for raw in [b"5", b"null", b"[1, 2]", b'"text"']:
            req = urllib.request.Request(
                url, data=raw, headers={"Content-Type": "application/json"}
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req)
            assert e.value.code == 400
            assert "JSON object" in json.load(e.value)["error"]


@pytest.fixture(scope="module")
def cat_model(spark, sf_dir):
    """A pipeline WITH a categorical stage, so the export covers the
    indexer→OHE encoding path, not just plain numerics."""
    orders = load_table(spark, sf_dir, "orders")
    feats = orders.select(
        F.col("o_totalprice").alias("y"),
        (F.col("o_totalprice") / 1000.0).alias("x1"),
        (F.col("o_orderkey") % 7).cast("int").alias("x2"),
        F.col("o_orderstatus").alias("status"),
    )
    return train_gbt_regressor(
        feats,
        label_col="y",
        numeric_features=["x1", "x2"],
        categorical_features=["status"],
        max_iter=5,
    ).model


def test_exported_scorer_matches_spark_transform(spark, sf_dir, cat_model):
    """The session-free scorer is only a production path if it IS the
    model: on a fixture sample (numerics + categorical, including the
    unseen-label bucket) scorer(features) must equal transform's
    prediction to 1e-9."""
    from nyc_taxi_etl_pyspark_spark.ml.export import GBTScorer

    scorer = GBTScorer.from_pipeline(cat_model)
    orders = load_table(spark, sf_dir, "orders")
    sample = orders.select(
        (F.col("o_totalprice") / 1000.0).alias("x1"),
        (F.col("o_orderkey") % 7).cast("int").alias("x2"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("y"),
    ).limit(200)
    spark_preds = cat_model.transform(sample).select(
        "x1", "x2", "status", "prediction"
    ).collect()
    assert len(spark_preds) == 200
    for r in spark_preds:
        got = scorer({"x1": r["x1"], "x2": r["x2"], "status": r["status"]})
        assert abs(got - r["prediction"]) <= 1e-9, (r, got)

    # unseen label → handleInvalid="keep" bucket, matching Spark
    probe = spark.createDataFrame(
        [(1.5, 3, "ZZ-UNSEEN")], "x1 double, x2 int, status string"
    )
    want = cat_model.transform(probe).first()["prediction"]
    got = scorer({"x1": 1.5, "x2": 3, "status": "ZZ-UNSEEN"})
    assert abs(got - want) <= 1e-9


def test_scorer_json_roundtrip_is_sessionless(cat_model):
    """Deploy artifact: to_json → from_json preserves predictions
    exactly, and the loaded scorer touches no pyspark machinery (pure
    dict/list walk — usable in a process that never imports pyspark)."""
    from nyc_taxi_etl_pyspark_spark.ml.export import GBTScorer

    s1 = GBTScorer.from_pipeline(cat_model)
    s2 = GBTScorer.from_json(s1.to_json())
    feats = {"x1": 12.3, "x2": 4, "status": "O"}
    assert s2(feats) == s1(feats)


def test_server_session_free_path(spark, cat_model):
    """The HTTP server on the exported scorer: same contract, same
    numbers as the Spark-resident path — with NO spark/model handed to
    the server at all."""
    from nyc_taxi_etl_pyspark_spark.ml.export import GBTScorer

    scorer = GBTScorer.from_pipeline(cat_model)
    required = {"x1": float, "x2": int, "status": str}
    features = {"x1": 42.5, "x2": 3, "status": "F"}
    with ModelServer(required_fields=required, scorer=scorer) as srv:
        host, port = srv.addr
        status, body = _post(f"http://{host}:{port}/predict", features)
    assert status == 200
    want = round(predict_one(spark, cat_model, features), 2)
    assert body == {"prediction": want}


def test_coerce_request_contract():
    assert coerce_request({"x1": "2.5", "x2": "7"}, REQUIRED) == {
        "x1": 2.5,
        "x2": 7,
    }
    with pytest.raises(ValueError, match="missing"):
        coerce_request({"x1": 1.0}, REQUIRED)
    with pytest.raises(ValueError, match="not coercible"):
        coerce_request({"x1": 1.0, "x2": "seven"}, REQUIRED)


def test_exported_scorer_matches_deep_model(spark, sf_dir):
    """Parity must hold for a DEEPER ensemble too (depth 7, 40 trees):
    more levels exercise long split chains and leaf precision where a
    subtle export bug (off-by-one on threshold comparison, wrong child
    routing) would first surface."""
    from nyc_taxi_etl_pyspark_spark.ml.export import GBTScorer

    orders = load_table(spark, sf_dir, "orders")
    feats = orders.select(
        F.col("o_totalprice").alias("y"),
        (F.col("o_totalprice") / 1000.0).alias("x1"),
        (F.col("o_orderkey") % 97).cast("int").alias("x2"),
        F.col("o_orderpriority").alias("prio"),
    )
    model = train_gbt_regressor(
        feats,
        label_col="y",
        numeric_features=["x1", "x2"],
        categorical_features=["prio"],
        max_depth=7,
        max_iter=40,
    ).model
    scorer = GBTScorer.from_pipeline(model)
    sample = feats.drop("y").limit(100)
    preds = model.transform(sample).collect()
    assert len(preds) == 100
    for r in preds:
        got = scorer({"x1": r["x1"], "x2": r["x2"], "prio": r["prio"]})
        assert abs(got - r["prediction"]) <= 1e-9


def test_webapp_form_and_predict_web():
    """The reference's HTML surface (src/webapp/webapp.py:26-83 +
    templates/index.html): GET / renders the form, POST /predict_web
    takes form-encoded fields, derives trip_duration_min server-side
    from the distance at AVG_SPEED_MPH, scores, and renders the
    prediction + estimated duration; bad input renders the error page
    with 500 (the reference's behavior)."""
    import urllib.parse
    import urllib.request

    from nyc_taxi_etl_pyspark_spark.ml.serving import AVG_SPEED_MPH

    seen = {}

    def fake_scorer(features):
        seen.update(features)
        return features["trip_distance"] * 2 + features["trip_duration_min"]

    required = {
        "trip_distance": float,
        "trip_duration_min": float,
        "passenger_count": int,
        "pickup_hour": int,
        "payment_type": int,
    }
    with ModelServer(required_fields=required, scorer=fake_scorer) as srv:
        host, port = srv.addr
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(base + "/") as resp:
            html = resp.read().decode()
            assert resp.status == 200
            assert 'action="/predict_web"' in html
            assert 'name="trip_distance"' in html

        form = {
            "trip_distance": "6.0",
            "passenger_count": "2",
            "pickup_hour": "14",
            "payment_type": "1",
        }
        req = urllib.request.Request(
            base + "/predict_web",
            data=urllib.parse.urlencode(form).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req) as resp:
            html = resp.read().decode()
        # duration derived server-side: 6.0 / 12 mph * 60 = 30.0 min
        assert seen["trip_duration_min"] == (6.0 / AVG_SPEED_MPH) * 60.0
        assert seen["passenger_count"] == 2 and seen["pickup_hour"] == 14
        assert "Predicted total amount: 42.0" in html  # 6*2 + 30
        assert "Estimated duration (min): 30.0" in html

        bad = urllib.request.Request(
            base + "/predict_web",
            data=urllib.parse.urlencode({"trip_distance": "abc"}).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("bad form input should 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert 'id="error"' in e.read().decode()
