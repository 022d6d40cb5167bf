"""Single-row model inference and the online-serving surface
(SURVEY.md §2.10 M7 / §3.3).

The reference serves predictions from Flask by building a 1-row DataFrame
per HTTP request (``src/api/app.py:33-37``, ``src/webapp/webapp.py:56-68``).
``predict_one`` is that path as a library function: dict in → float out,
with the model held resident (load once at process start, ref
``src/models/model_loader.py:17-42``). ``ModelServer`` closes the HTTP
gap with the stdlib only: the same request contract as the reference's
``/predict`` — JSON body validated/coerced against a required-fields map
(``api/app.py:10-16,25-31``), 400 on bad input, 500 on scoring error,
``{"prediction": round(x, 2)}`` on success (``api/app.py:39-44``).

Serving-at-scale: a SparkSession scoring 1-row frames is the correct
parity demo but the wrong production hot path. The production path is
``ml/export.py``: the fitted pipeline's trees and feature encoders are
exported once to a JSON spec and ``GBTScorer`` evaluates it per request
in pure Python — no SparkSession in the serving process at all.
``ModelServer(scorer=...)`` is that deployment; the Spark-resident mode
stays as the parity cross-check (scorer == ``transform`` to 1e-9,
tests/test_serving.py). The request CONTRACT is identical either way
and deliberately matches the reference's.
"""

from __future__ import annotations

import html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.ml import PipelineModel
from pyspark.sql import Row, SparkSession


# the reference webapp's fleet-average NYC yellow-cab speed, used to
# derive trip_duration_min server-side from the form's distance
# (src/webapp/webapp.py:24, 48-52)
AVG_SPEED_MPH = 12.0

# the form's fields and coercions, exactly webapp.py:40-43 (duration
# is NOT a form field — it is derived)
_WEB_FORM_FIELDS: dict[str, type] = {
    "trip_distance": float,
    "passenger_count": int,
    "pickup_hour": int,
    "payment_type": int,
}


def _form_page(
    prediction=None, duration_est=None, error=None, form=None
) -> str:
    """Minimal HTML mirroring the reference's templates/index.html: the
    input form, plus the prediction / estimated-duration block (or the
    error block) when present — stdlib string rendering, no template
    engine."""
    form = form or {}
    # user-controlled form values and exception text are reflected back
    # into the page — escape them (quote=True: values land in an HTML
    # attribute) so the demo endpoint is not an XSS vector
    rows = "\n".join(
        f'<label>{name} <input name="{name}" '
        f'value="{html.escape(str(form.get(name, "")), quote=True)}">'
        f"</label><br>"
        for name in _WEB_FORM_FIELDS
    )
    result = ""
    if prediction is not None:
        result = (
            f'<p id="prediction">Predicted total amount: '
            f"{html.escape(str(prediction))}</p>"
            f'<p id="duration">Estimated duration (min): '
            f"{html.escape(str(duration_est))}</p>"
        )
    if error is not None:
        result = f'<p id="error">Error: {html.escape(str(error))}</p>'
    return (
        "<!doctype html><html><head><title>Trip predictor</title></head>"
        f'<body><h1>Trip predictor</h1>'
        f'<form method="post" action="/predict_web">{rows}'
        f'<button type="submit">Predict</button></form>{result}'
        "</body></html>"
    )


def load_model(path: str) -> PipelineModel:
    return PipelineModel.load(path)


def predict_one(
    spark: SparkSession, model: PipelineModel, features: dict
) -> float:
    """Score one feature dict through a fitted PipelineModel."""
    df = spark.createDataFrame([Row(**features)])
    return float(model.transform(df).first()["prediction"])


def coerce_request(data: dict, required_fields: dict[str, type]) -> dict:
    """Validate + type-coerce a request body the way the reference does
    (``api/app.py:25-31``): every required field present and castable to
    its declared type, else ValueError (the 400 path). A valid-JSON but
    non-object body (``5``, ``null``, ``[1]``) is rejected here too —
    previously it slipped past json.loads and crashed the handler
    thread with a TypeError instead of returning 400 (ADVICE r3)."""
    if not isinstance(data, dict):
        raise ValueError(
            f"request body must be a JSON object, got {type(data).__name__}"
        )
    missing = sorted(set(required_fields) - set(data))
    if missing:
        raise ValueError(f"missing fields: {missing}")
    out = {}
    for name, typ in required_fields.items():
        try:
            out[name] = typ(data[name])
        except (TypeError, ValueError) as exc:
            raise ValueError(f"field {name!r} not coercible to {typ.__name__}: "
                             f"{data[name]!r}") from exc
    return out


class ModelServer:
    """Stdlib-HTTP serving of a trained model.

    ``POST /predict`` with a JSON object of features → 200
    ``{"prediction": <round(x, 2)>}``; 400 with ``{"error": ...}`` on
    missing/uncoercible fields; 500 on scoring failure — the reference's
    Flask contract (``src/api/app.py``) without the Flask dependency.
    Model loads ONCE (reference ``model_loader.py:17-42`` loads at
    module import); requests reuse it.

    Two scoring backends:

    - **session-free (production)**: pass ``scorer`` — any
      ``dict -> float`` callable, typically
      :class:`~nyc_taxi_etl_pyspark_spark.ml.export.GBTScorer` built
      from the exported trees. No SparkSession in the serving process;
      each request is a pure-Python tree walk.
    - **Spark-resident (parity demo)**: pass ``spark`` + ``model`` and
      each request runs ``predict_one`` through the PipelineModel —
      the reference's exact shape, kept as the cross-check that the
      exported scorer matches ``transform`` (tests/test_serving.py).

    Use as a context manager; ``addr`` gives the bound (host, port).
    """

    def __init__(
        self,
        spark: SparkSession | None = None,
        model: PipelineModel | None = None,
        required_fields: dict[str, type] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        scorer=None,
    ):
        if scorer is None and (spark is None or model is None):
            raise ValueError(
                "ModelServer needs either a session-free scorer= or the "
                "(spark, model) pair for the Spark-resident path"
            )
        if required_fields is None:
            raise ValueError("ModelServer requires the required_fields map")
        self.scorer = scorer
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep test output clean
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _reply_html(self, code: int, html: str) -> None:
                body = html.encode()
                self.send_response(code)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                # the reference webapp's home: render the empty form
                # (src/webapp/webapp.py:26-29 + templates/index.html)
                if self.path != "/":
                    self._reply(404, {"error": "not found"})
                    return
                self._reply_html(200, _form_page())

            def _score(self, features: dict) -> float:
                if server.scorer is not None:
                    return float(server.scorer(features))
                return predict_one(server.spark, server.model, features)

            def do_POST(self):
                if self.path == "/predict_web":
                    # HTML-form path with SERVER-SIDE duration
                    # derivation (src/webapp/webapp.py:32-83): the form
                    # carries distance/passengers/hour/payment only;
                    # trip_duration_min is estimated from the distance
                    # at the fleet's average speed before scoring.
                    import urllib.parse

                    try:
                        n = int(self.headers.get("Content-Length", 0))
                        form = {
                            k: v[0]
                            for k, v in urllib.parse.parse_qs(
                                self.rfile.read(n).decode()
                            ).items()
                        }
                        features = coerce_request(form, _WEB_FORM_FIELDS)
                    except ValueError as exc:
                        # the reference renders the error page with 500
                        # (webapp.py:81-83) — even for bad input
                        self._reply_html(500, _form_page(error=str(exc)))
                        return
                    duration_est = (
                        features["trip_distance"] / AVG_SPEED_MPH
                    ) * 60.0
                    features["trip_duration_min"] = duration_est
                    try:
                        pred = self._score(features)
                    except Exception as exc:
                        self._reply_html(500, _form_page(error=str(exc)))
                        return
                    self._reply_html(
                        200,
                        _form_page(
                            prediction=round(pred, 2),
                            duration_est=round(duration_est, 1),
                            form=form,
                        ),
                    )
                    return
                if self.path != "/predict":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    data = json.loads(self.rfile.read(n) or b"{}")
                    features = coerce_request(data, server.required_fields)
                except (ValueError, json.JSONDecodeError) as exc:
                    self._reply(400, {"error": str(exc)})
                    return
                try:
                    pred = self._score(features)
                except Exception as exc:  # scoring failure → 500
                    self._reply(500, {"error": str(exc)})
                    return
                self._reply(200, {"prediction": round(pred, 2)})

        self.spark = spark
        self.model = model
        self.required_fields = required_fields
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def addr(self) -> tuple[str, int]:
        return self._httpd.server_address[:2]

    def __enter__(self) -> "ModelServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=10)
