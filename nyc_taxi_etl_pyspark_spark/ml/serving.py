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

Serving-at-scale note: a SparkSession scoring 1-row frames is the
correct parity demo but the wrong production hot path — a real
deployment exports the PipelineModel's trees and scores outside the JVM
session, or batches requests. The request CONTRACT here is what carries
over; it is deliberately identical to the reference's.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.ml import PipelineModel
from pyspark.sql import Row, SparkSession


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
    its declared type, else ValueError (the 400 path)."""
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
    """Stdlib-HTTP serving of a resident PipelineModel.

    ``POST /predict`` with a JSON object of features → 200
    ``{"prediction": <round(x, 2)>}``; 400 with ``{"error": ...}`` on
    missing/uncoercible fields; 500 on scoring failure — the reference's
    Flask contract (``src/api/app.py``) without the Flask dependency.
    Model and session load ONCE (reference ``model_loader.py:17-42``
    loads at module import); requests reuse them.

    Use as a context manager; ``addr`` gives the bound (host, port).
    """

    def __init__(
        self,
        spark: SparkSession,
        model: PipelineModel,
        required_fields: dict[str, type],
        host: str = "127.0.0.1",
        port: int = 0,
    ):
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

            def do_POST(self):
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
                    pred = predict_one(server.spark, server.model, features)
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
