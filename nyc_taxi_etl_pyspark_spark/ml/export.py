"""Session-free model export: fitted GBT pipeline → pure-Python scorer.

The reference serves predictions by spinning a 1-row Spark DataFrame per
HTTP request through the resident PipelineModel (``src/api/app.py:33-37``)
— correct, but the wrong hot path: every request pays Py4J + Catalyst +
task-scheduling latency, and the serving tier drags a full SparkSession
(JVM, ~GBs) along as a dependency. A GBT model is just trees; scoring one
row is microseconds of pure Python.

``export_gbt_pipeline`` walks the fitted stages ONCE at export time —
StringIndexerModel labels, OneHotEncoderModel category sizes,
VectorAssembler layout, and every GBT tree (via the model's Java node
structure: InternalNode/LeafNode, Continuous/CategoricalSplit) — into a
plain JSON-serializable spec. ``GBTScorer`` evaluates that spec with no
pyspark import at all: the serving process needs ``json`` and this file.

Parity contract (tests/test_serving.py): scorer(features) equals Spark's
``model.transform`` prediction to 1e-9 — same feature encoding rules
(handleInvalid="keep" unseen-label bucket, dropLast one-hot) and the
same tree-walk semantics (left iff x <= threshold / x in leftCategories,
prediction = Σ weight_i · tree_i(x), summed in tree order like the
JVM's dot product).
"""

from __future__ import annotations

import json
from typing import Any


def _export_node(jnode) -> dict:
    """Recursively export a Java ml.tree Node to plain dicts."""
    cls = jnode.getClass().getSimpleName()
    if cls == "LeafNode":
        return {"leaf": float(jnode.prediction())}
    split = jnode.split()
    scls = split.getClass().getSimpleName()
    out: dict[str, Any] = {
        "f": int(split.featureIndex()),
        "l": _export_node(jnode.leftChild()),
        "r": _export_node(jnode.rightChild()),
    }
    if scls == "ContinuousSplit":
        out["t"] = float(split.threshold())
    else:  # CategoricalSplit: go left iff feature value ∈ leftCategories
        out["cats"] = [float(c) for c in split.leftCategories()]
    return out


def export_gbt_pipeline(model) -> dict:
    """Export a fitted ``Pipeline(StringIndexer* → OneHotEncoder* →
    VectorAssembler → GBTRegressor)`` (the trainer's shape,
    ``ml/trainer.py``) to a JSON-safe spec. Raises on stages outside
    that vocabulary — an export that silently dropped a stage would
    serve wrong numbers."""
    indexers: dict[str, dict] = {}  # outputCol -> {col, labels, handle_invalid}
    ohe: dict[str, dict] = {}  # outputCol -> {idx_col, width}
    assembler_cols: list[str] | None = None
    trees: list[dict] | None = None
    weights: list[float] | None = None

    for stage in model.stages:
        kind = type(stage).__name__
        if kind == "StringIndexerModel":
            labels = list(stage.labelsArray[0])
            indexers[stage.getOutputCol()] = {
                "col": stage.getInputCol(),
                "labels": labels,
                "handle_invalid": stage.getHandleInvalid(),
            }
        elif kind == "OneHotEncoderModel":
            size = int(stage.categorySizes[0])
            width = size - 1 if stage.getDropLast() else size
            ohe[stage.getOutputCol()] = {
                "idx_col": stage.getInputCol(),
                "width": width,
            }
        elif kind == "VectorAssembler":
            assembler_cols = list(stage.getInputCols())
        elif kind == "GBTRegressionModel":
            trees = [
                _export_node(t._call_java("rootNode")) for t in stage.trees
            ]
            weights = [float(w) for w in stage.treeWeights]
        else:
            raise ValueError(
                f"export_gbt_pipeline: unsupported stage {kind}; the "
                "session-free scorer covers the trainer's "
                "indexer/OHE/assembler/GBT vocabulary."
            )
    if assembler_cols is None or trees is None:
        raise ValueError("export_gbt_pipeline: pipeline lacks assembler or GBT")

    inputs: list[dict] = []
    for c in assembler_cols:
        if c in ohe:
            idx = indexers[ohe[c]["idx_col"]]
            inputs.append(
                {
                    "kind": "cat",
                    "col": idx["col"],
                    "labels": idx["labels"],
                    "handle_invalid": idx["handle_invalid"],
                    "width": ohe[c]["width"],
                }
            )
        else:
            inputs.append({"kind": "num", "col": c})
    return {
        "format": "gbt-regression-v1",
        "inputs": inputs,
        "trees": trees,
        "tree_weights": weights,
    }


class GBTScorer:
    """Pure-Python evaluator of an exported spec: ``scorer(features)``
    → prediction, no SparkSession anywhere. Built once at deploy time
    (``from_pipeline`` needs Spark; ``from_json`` does not), then every
    request is dict → feature vector → Σ wᵢ·treeᵢ(x)."""

    def __init__(self, spec: dict) -> None:
        if spec.get("format") != "gbt-regression-v1":
            raise ValueError(f"unsupported scorer spec {spec.get('format')!r}")
        self.spec = spec
        self._inputs = spec["inputs"]
        self._weights = spec["tree_weights"]
        # categorical split membership as sets for O(1) lookups
        self._trees = [self._prep(t) for t in spec["trees"]]

    @classmethod
    def from_pipeline(cls, model) -> "GBTScorer":
        return cls(export_gbt_pipeline(model))

    @classmethod
    def from_json(cls, payload: str) -> "GBTScorer":
        return cls(json.loads(payload))

    def to_json(self) -> str:
        return json.dumps(self.spec)

    @staticmethod
    def _prep(node: dict) -> dict:
        if "leaf" in node:
            return node
        out = dict(node)
        if "cats" in out:
            out["cats"] = set(out["cats"])
        out["l"] = GBTScorer._prep(node["l"])
        out["r"] = GBTScorer._prep(node["r"])
        return out

    # -- feature encoding (mirrors StringIndexer/OHE/Assembler) ----------
    def _vector(self, features: dict) -> list[float]:
        vec: list[float] = []
        for inp in self._inputs:
            if inp["kind"] == "num":
                vec.append(float(features[inp["col"]]))
                continue
            val = features[inp["col"]]
            labels = inp["labels"]
            try:
                idx = labels.index(val)
            except ValueError:
                try:
                    idx = labels.index(str(val))
                except ValueError:
                    if inp["handle_invalid"] == "keep":
                        idx = len(labels)  # the unseen-label bucket
                    else:
                        raise ValueError(
                            f"unseen label {val!r} for column {inp['col']!r} "
                            f"(handleInvalid={inp['handle_invalid']})"
                        ) from None
            width = inp["width"]
            vec.extend(1.0 if i == idx else 0.0 for i in range(width))
        return vec

    @staticmethod
    def _eval(node: dict, x: list[float]) -> float:
        while "leaf" not in node:
            if "t" in node:
                node = node["l"] if x[node["f"]] <= node["t"] else node["r"]
            else:
                node = node["l"] if x[node["f"]] in node["cats"] else node["r"]
        return node["leaf"]

    def __call__(self, features: dict) -> float:
        x = self._vector(features)
        total = 0.0
        for w, t in zip(self._weights, self._trees):
            total += w * self._eval(t, x)
        return total
