"""CDC merge / upsert operator (round-2 extension; absent in reference —
the reference only ever overwrites whole parquet partitions,
``src/pipeline/etl_writer.py:7-12``).

``merge_upsert`` is the engine's MERGE INTO: apply a change set to a
base relation with latest-wins semantics, expressed as ONE full-outer
join — the format-agnostic core of what Delta/Iceberg MERGE does, on
plain DataFrames. At 100 TB the join shuffles both sides by the merge
key once; if the change set is small (the common CDC case) Catalyst/AQE
broadcasts it and the base never shuffles at all.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    latest_by: Sequence[str] | None = None,
) -> DataFrame:
    """Latest-wins upsert: rows in ``updates`` replace same-key rows in
    ``base``; unmatched update rows are inserts; unmatched base rows pass
    through. ``updates`` must carry FULL rows (column-level patching
    would need explicit per-column change flags — out of scope).

    A change batch with SEVERAL rows for one key would fan out through
    the join into duplicate output rows — so either pre-reduce the batch
    yourself (as streaming/jobs.py does with max_by) or pass
    ``latest_by``: the ordering columns (e.g. a change timestamp +
    sequence id) by which the in-batch winner per key is chosen here via
    one row_number pass before the merge.

    Implementation: full-outer join on the keys + per-column "update row
    exists → update value" selection, gated on a key-presence flag rather
    than per-column ``coalesce`` so an update can legitimately set a
    column to NULL.
    """
    from pyspark.sql import Window

    value_cols = [c for c in base.columns if c not in key_cols]
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"merge_upsert: schema mismatch base={base.columns} updates={updates.columns}"
        )
    if latest_by:
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in latest_by]
        )
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    u = updates.withColumn("__is_upd", F.lit(True))
    joined = base.join(u, on=list(key_cols), how="full")
    picked = [
        F.when(F.col("__is_upd"), u[c]).otherwise(base[c]).alias(c)
        for c in value_cols
    ]
    return joined.select(*key_cols, *picked)


# -- full-form MERGE (conditional clauses) --------------------------------

_SQL_KEYWORDS = frozenset(
    """and or not in is null true false case when then else end between
    like rlike ilike exists all any some distinct as cast interval
    current_date current_timestamp""".split()
)


def _rewrite_refs(
    expr: str, tcols: list[str], scols: list[str], bare_side: str
) -> str:
    """Rewrite column references in a clause expression onto the
    prefixed joined frame: ``t.<col>`` → ``__t_<col>``, ``s.<col>`` →
    ``__s_<col>``, and a BARE identifier that names a column resolves
    to ``bare_side`` first (``"t"``, ``"s"``, or ``"ts"`` =
    target-then-source — the matched-clause convention; Delta would
    demand qualification, we pick the deterministic side and document
    it). Qualifiers other than the canonical ``t``/``s`` (the txsql
    layer normalizes user aliases to these) pass through untouched so
    genuine struct access keeps working. String literals are never
    rewritten; identifiers followed by ``(`` are function calls, not
    columns."""
    tset = {c.lower(): c for c in tcols}
    sset = {c.lower(): c for c in scols}
    sides = {"t": (tset, None), "s": (sset, None), "ts": (tset, sset)}
    first, second = sides.get(bare_side, (tset, sset))
    ident = re.compile(
        r"(?<![\w.'])(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*)(?!\s*\()(?![\w.])"
    )

    def repl(m: re.Match) -> str:
        q, name = m.group(1), m.group(2)
        ln = name.lower()
        if q is not None:
            if q.lower() == "t" and ln in tset:
                return f"__t_{tset[ln]}"
            if q.lower() == "s" and ln in sset:
                return f"__s_{sset[ln]}"
            return m.group(0)
        if ln in _SQL_KEYWORDS:
            return m.group(0)
        if first is not None and ln in first:
            return f"__{'t' if first is tset else 's'}_{first[ln]}"
        if second is not None and ln in second:
            return f"__{'t' if second is tset else 's'}_{second[ln]}"
        return m.group(0)

    out = []
    for i, seg in enumerate(re.split(r"('(?:[^']|'')*')", expr)):
        out.append(seg if i % 2 else ident.sub(repl, seg))
    return "".join(out)


# which side a BARE identifier resolves to, per clause group (see
# _rewrite_refs): matched sees both (target first), INSERT sees no
# target row, BY SOURCE sees no source row
_BARE = {"matched": "ts", "not_matched": "s", "not_matched_by_source": "t"}


def _reject_struct_exprs(
    clauses: Sequence[dict], base: DataFrame, updates: DataFrame
) -> None:
    """Clause EXPRESSIONS are rewritten onto the ``__t_``/``__s_``
    prefixed joined frame by :func:`_rewrite_refs`, which treats an
    unqualified dotted path as a possible struct access and leaves it
    alone — but the joined frame's columns are RENAMED, so a genuine
    struct field access could silently mis-resolve. Reject the
    combination loudly instead of producing a wrong merge (whole-row
    ``'*'`` clauses never rewrite expressions, so struct COLUMNS
    themselves are fine there)."""
    has_exprs = any(
        c.get("cond")
        or isinstance(c.get("set"), dict)
        or isinstance(c.get("values"), dict)
        for c in clauses
    )
    if not has_exprs:
        return
    structy = sorted(
        {
            f.name
            for f in list(base.schema.fields) + list(updates.schema.fields)
            if f.dataType.typeName() == "struct"
        }
    )
    if structy:
        raise ValueError(
            f"clause-form MERGE expressions are not supported on "
            f"struct-typed columns {structy}: field access would "
            "mis-resolve through the reference rewriter — flatten the "
            "structs or use whole-row '*' clauses / the upsert form"
        )


def _build_groups(
    clauses: Sequence[dict], tcols: list[str]
) -> dict[str, list[tuple[str, dict]]]:
    """Validate the clause list and bucket it into the three MERGE
    groups, each clause labelled ``c<i>`` by its position (labels feed
    the ``__action`` CASE and the projection arms)."""
    groups: dict[str, list[tuple[str, dict]]] = {
        "matched": [],
        "not_matched": [],
        "not_matched_by_source": [],
    }
    for i, c in enumerate(clauses):
        when = c.get("when")
        if when not in groups:
            raise ValueError(f"unknown MERGE clause group: {when!r}")
        if when == "not_matched" and c["action"] != "insert":
            raise ValueError(
                "WHEN NOT MATCHED supports INSERT only (there is no "
                "target row to update or delete)"
            )
        if when == "not_matched_by_source" and c["action"] == "insert":
            raise ValueError(
                "WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE only "
                "(there is no source row to insert from)"
            )
        cols = c.get("set") if c["action"] == "update" else c.get("values")
        if isinstance(cols, dict):
            unknown = sorted(set(cols) - set(tcols))
            if unknown:
                raise ValueError(
                    f"MERGE clause references columns not on the target "
                    f"table: {unknown}"
                )
        groups[when].append((f"c{i}", c))
    return groups


def _group_case(
    rows: list[tuple[str, dict]], default: str, tcols: list[str], scols: list[str]
):
    """First-matching-clause CASE for one group: the label of the first
    clause whose condition holds, else ``default``."""
    expr = F.lit(default)
    for label, c in reversed(rows):
        cond = (
            F.expr(_rewrite_refs(c["cond"], tcols, scols, _BARE[c["when"]]))
            if c.get("cond")
            else F.lit(True)
        )
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return expr


def _clause_projection(
    tcols: list[str],
    scols: list[str],
    ordered: list[tuple[str, dict]],
    schema: dict,
) -> list:
    """Per-target-column projection over a frame tagged with
    ``__action``: each clause label maps to its SET/VALUES expression
    (earliest clause's ``when()`` wins), default is the target value;
    everything cast to the target column type so the merged schema is
    byte-identical to the table's."""
    out_cols = []
    for col in tcols:
        pick = F.col(f"__t_{col}")
        # later clauses first so the earliest clause's when() wins
        for label, c in reversed(ordered):
            if c["action"] == "delete":
                continue
            if c["action"] == "update":
                st = c.get("set")
                if st == "*":
                    st = {x: f"s.{x}" for x in tcols if x in scols}
                if col in st:
                    v = F.expr(
                        _rewrite_refs(st[col], tcols, scols, _BARE[c["when"]])
                    )
                else:
                    continue  # unset column keeps the target value
            else:  # insert
                vals = c.get("values")
                if vals == "*":
                    vals = {x: f"s.{x}" for x in tcols if x in scols}
                v = (
                    F.expr(_rewrite_refs(vals[col], tcols, scols, "s"))
                    if col in vals
                    else F.lit(None)
                )
            pick = F.when(F.col("__action") == label, v).otherwise(pick)
        out_cols.append(pick.cast(schema[col]).alias(col))
    return out_cols


def merge_clauses(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    clauses: Sequence[dict],
) -> DataFrame:
    """Full-form MERGE: the Delta/Iceberg clause semantics expressed as
    ONE full-outer join whose clause conditions become CASE arms —
    still a single shuffle (or a broadcast when the change set is
    small), no per-clause joins, no UDFs, everything inside
    whole-stage codegen.

    ``clauses`` is an ordered list of dicts:

    - ``{"when": "matched", "cond": sql|None, "action": "update",
      "set": {col: expr} | "*"}``
    - ``{"when": "matched", "cond": sql|None, "action": "delete"}``
    - ``{"when": "not_matched", "cond": sql|None, "action": "insert",
      "values": {col: expr} | "*"}``
    - ``{"when": "not_matched_by_source", "cond": sql|None,
      "action": "update"|"delete", ...}``

    Per standard MERGE semantics, within each group the FIRST clause
    whose condition holds applies; a row matching no clause keeps its
    target version (matched / by-source groups) or is not inserted
    (not-matched group). Expressions may qualify columns with the
    canonical ``t.`` / ``s.`` aliases; bare names resolve target-first
    in matched clauses, source-only in not-matched (INSERT sees no
    target row), target-only in by-source clauses (no source row).
    ``INSERT`` columns omitted from ``values`` become typed NULLs;
    every produced value is cast to the target column's type so the
    merged schema is byte-identical to the table's.

    The caller is responsible for source key uniqueness when any
    matched/by-source clause exists (``TransactionalTable.merge``
    pre-checks and raises — the SQL-standard cardinality violation);
    duplicate source keys here would fan matched target rows out.
    The INSERT-ONLY form (every clause ``not_matched``) carries the
    Delta relaxation instead: duplicate source keys are legal (every
    qualifying non-matching row inserts), target rows pass through
    exactly once — expressed as an anti-join of the source against
    the target KEYS unioned with the untouched base, so the base's
    value columns never shuffle at all."""
    tcols, scols = list(base.columns), list(updates.columns)
    for k in key_cols:
        if k not in tcols or k not in scols:
            raise ValueError(f"merge key {k!r} must exist on both sides")
    _reject_struct_exprs(clauses, base, updates)
    insert_only = bool(clauses) and all(
        c.get("when") == "not_matched" for c in clauses
    )
    t = base.select(
        *[F.col(c).alias(f"__t_{c}") for c in tcols],
        F.lit(True).alias("__in_t"),
    )
    s = updates.select(
        *[F.col(c).alias(f"__s_{c}") for c in scols],
        F.lit(True).alias("__in_s"),
    )
    if insert_only:
        # a full-outer join would fan a matched target row out once per
        # duplicate source key (every copy 'keep' → duplicated target
        # rows). Anti-join the source against the column-pruned target
        # keys, synthesize NULL target sides so the clause machinery
        # below evaluates identically, and union the untouched base in
        # at the end.
        tkeys = t.select(*[F.col(f"__t_{k}") for k in key_cols]).distinct()
        anti_on = [tkeys[f"__t_{k}"].eqNullSafe(s[f"__s_{k}"]) for k in key_cols]
        anti = s.join(
            tkeys, on=anti_on if len(anti_on) > 1 else anti_on[0], how="left_anti"
        )
        tschema = {f.name: f.dataType for f in base.schema.fields}
        j = anti.select(
            *[
                F.lit(None).cast(tschema[c]).alias(f"__t_{c}")
                for c in tcols
            ],
            F.lit(None).cast("boolean").alias("__in_t"),
            "*",
        )
    else:
        on = [t[f"__t_{k}"].eqNullSafe(s[f"__s_{k}"]) for k in key_cols]
        j = t.join(s, on=on if len(on) > 1 else on[0], how="full")

    matched = F.col("__in_t").isNotNull() & F.col("__in_s").isNotNull()
    only_s = F.col("__in_t").isNull()
    groups = _build_groups(clauses, tcols)

    action = (
        F.when(matched, _group_case(groups["matched"], "keep", tcols, scols))
        .when(only_s, _group_case(groups["not_matched"], "drop", tcols, scols))
        .otherwise(
            _group_case(groups["not_matched_by_source"], "keep", tcols, scols)
        )
    )
    j = j.withColumn("__action", action)
    dead = {
        label
        for g in groups.values()
        for label, c in g
        if c["action"] == "delete"
    } | {"drop"}
    j = j.where(~F.col("__action").isin(*dead))

    schema = {f.name: f.dataType for f in base.schema.fields}
    out = j.select(
        *_clause_projection(
            tcols,
            scols,
            groups["matched"]
            + groups["not_matched"]
            + groups["not_matched_by_source"],
            schema,
        )
    )
    if insert_only:
        # target rows pass through untouched — unioned, never joined
        out = base.select(*tcols).unionByName(out)
    return out


def merge_clauses_decomposed(
    target: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    clauses: Sequence[dict],
    carry_cols: Sequence[str],
    broadcast_source: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Full-form MERGE decomposed into its MERGE-ON-READ effects —
    identical clause semantics to :func:`merge_clauses`, different
    output shape:

    - ``touched``: the ``carry_cols`` (e.g. ``__dv_file``/``__dv_pos``
      physical positions) of every target row whose first matching
      MATCHED clause fires UPDATE or DELETE — the rows a
      deletion-vector commit soft-deletes;
    - ``appends``: the matched UPDATE outputs plus the qualifying
      NOT MATCHED inserts, projected and cast to the target schema.

    Target rows matching no source key — or matching one but failing
    every clause condition ("keep") — appear in NEITHER frame: that is
    the point of the decomposition. The copy-on-write form must
    rewrite their files to retain them; this form leaves those files
    byte-identical and the commit is O(matched + inserts).

    ``NOT MATCHED BY SOURCE`` clauses cannot be decomposed this way
    (they touch every unmatched target row, which is O(table)) and are
    rejected — callers route them through the copy-on-write rewrite.
    The caller is responsible for source key uniqueness exactly as for
    :func:`merge_clauses` (``TransactionalTable.merge`` pre-checks),
    and for passing a ``target`` subset that contains EVERY row whose
    key could appear in the source (band-pruned candidate files are
    complete for non-NULL source keys)."""
    if any(c.get("when") == "not_matched_by_source" for c in clauses):
        raise ValueError(
            "merge_clauses_decomposed cannot express NOT MATCHED BY "
            "SOURCE (it touches every unmatched target row); use the "
            "copy-on-write merge_clauses rewrite"
        )
    carry = list(carry_cols)
    tcols = [c for c in target.columns if c not in set(carry)]
    scols = list(updates.columns)
    for k in key_cols:
        if k not in tcols or k not in scols:
            raise ValueError(f"merge key {k!r} must exist on both sides")
    _reject_struct_exprs(clauses, target.select(*tcols), updates)
    groups = _build_groups(clauses, tcols)
    schema = {
        f.name: f.dataType for f in target.schema.fields if f.name in set(tcols)
    }

    t = target.select(
        *[F.col(c).alias(f"__t_{c}") for c in tcols], *carry
    )
    s = updates.select(*[F.col(c).alias(f"__s_{c}") for c in scols])
    # ``broadcast_source`` (callers gate it on the source's estimated
    # key count) hints the CDC-batch shape — candidate files never
    # shuffle. A table-sized source must NOT be broadcast (executor
    # OOM); the shuffle hash join keeps the same semantics at
    # O(matched + source) cost.
    s_side = F.broadcast(s) if broadcast_source else s
    on = [t[f"__t_{k}"].eqNullSafe(s[f"__s_{k}"]) for k in key_cols]
    pairs = t.join(
        s_side, on=on if len(on) > 1 else on[0], how="inner"
    ).withColumn("__action", _group_case(groups["matched"], "keep", tcols, scols))

    touched = pairs.where(F.col("__action") != "keep").select(*carry)

    upd_labels = [
        label for label, c in groups["matched"] if c["action"] == "update"
    ]
    replaced = (
        pairs.where(F.col("__action").isin(upd_labels)).select(
            *_clause_projection(tcols, scols, groups["matched"], schema)
        )
        if upd_labels
        else None
    )

    # inserts: source rows matching NO target row, run through the
    # NOT MATCHED group with a typed-NULL target side (identical
    # evaluation to merge_clauses' full-outer source-only rows). The
    # anti-join is against the MATCHED source keys — bounded by the
    # batch, never the table's key set.
    mk = pairs.select(
        *[F.col(f"__s_{k}").alias(f"__mk_{k}") for k in key_cols]
    ).distinct()
    anti_on = [
        updates[k].eqNullSafe(mk[f"__mk_{k}"]) for k in key_cols
    ]
    # matched keys are a subset of the source keys, so the same size
    # gate governs this broadcast
    mk_side = F.broadcast(mk) if broadcast_source else mk
    anti = updates.join(
        mk_side,
        on=anti_on if len(anti_on) > 1 else anti_on[0],
        how="left_anti",
    )
    ins = (
        anti.select(
            *[F.lit(None).cast(schema[c]).alias(f"__t_{c}") for c in tcols],
            *[F.col(c).alias(f"__s_{c}") for c in scols],
        )
        .withColumn(
            "__action", _group_case(groups["not_matched"], "drop", tcols, scols)
        )
        .where(F.col("__action") != "drop")
        .select(*_clause_projection(tcols, scols, groups["not_matched"], schema))
    )
    appends = ins if replaced is None else replaced.unionByName(ins)
    return touched, appends
