"""SQL DML front door for transactional tables.

``create_view`` (``sources/txtable.py``) gives commit-log tables SQL
*reads*; this module completes the UX with SQL *writes*: statement
text in the four standard DML shapes routes to the existing
transactional operators —

- ``MERGE INTO t USING s ON t.k = s.k
  WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``
  → :meth:`TransactionalTable.merge` (latest-wins upsert);
- ``UPDATE t SET col = expr, ... [WHERE pred]``
  → :meth:`TransactionalTable.update_where` (copy-on-write rewrite of
  only the files the predicate's prune hints cannot exclude);
- ``DELETE FROM t WHERE pred``
  → :meth:`TransactionalTable.delete_where`;
- ``INSERT INTO t <query>`` → ``commit(mode="append")``;

plus ``CREATE TABLE t LOCATION '<path>' [PARTITIONED BY (...)] AS
<query>`` (CTAS — commits v0, registers the name as view + DML
target) and the maintenance statements ``OPTIMIZE t [INCREMENTAL]``,
``VACUUM t [RETAIN n VERSIONS] [DRY RUN]``, ``SHOW PARTITIONS
t`` (manifest-only partition index), ``DESCRIBE HISTORY t``, ``DESCRIBE DETAIL t`` (one-manifest
layout/health summary) and
``RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF <instant>``
(a new commit pinning the old snapshot, Delta's RESTORE). SELECTs
additionally get the CDF table-valued function:
``table_changes('t', from [, to] [, 'k1,k2'])`` rewrites to the keyed
snapshot-diff change feed (keys from the trailing argument or the
table's sticky clustering columns).

Deliberately NOT a SQL parser: only the statement SHAPE is recognized
(keyword scanning outside strings/parens — ``_split_top_level``);
every predicate, assignment expression, and source query is handed
verbatim to Spark SQL, so expression semantics are Catalyst's, never
ours. Matches how Delta's own DML entered the world before DSv2: a
thin statement router over table-format operators. Unsupported shapes
raise loudly — nothing is half-parsed.

Table names resolve through an explicit ``tables={name: handle}``
argument, falling back to the process-wide registry that
``TransactionalTable.create_view`` populates — so the natural flow
"create_view then run DML against the same name" needs no extra
wiring. MERGE sources and INSERT queries resolve through Spark
itself (temp views, catalog tables, or a parenthesized subquery).

:func:`execute_sql` is the unified entry point: it first rewrites
time-travel clauses — ``<name> VERSION AS OF <n>`` and ``<name>
TIMESTAMP AS OF '<instant>'`` (Delta's SELECT-level time travel) —
on any registered transactional name ANYWHERE in the statement into
pinned snapshot views, then routes SELECT/WITH text to ``spark.sql``
and everything else to :func:`execute_dml`. Travel therefore also
works inside DML source queries (``INSERT INTO t SELECT * FROM t
VERSION AS OF 0`` is the SQL spelling of a snapshot restore-append).
Timestamps resolve through the commit log's wall-times
(``version_as_of``); naive ISO instants are UTC, the same convention
as the streaming source's ``startingtimestamp``.

Reference parity: the reference engine has no DML surface at all
(its only SQL is a filter string, ``src/features/
transformations.py``); this is part of the storage layer's
beyond-reference lakehouse tier.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_etl_pyspark_spark.sources.txtable import (
    TransactionalTable,
    _scan_top_level,
    _split_top_level,
)

# view/table name -> handle; populated by TransactionalTable.create_view
# and register_dml_target. Process-wide like Spark's own temp-view
# namespace (names are session-scoped there; collisions overwrite,
# latest wins — same contract).
_DML_TARGETS: dict[str, TransactionalTable] = {}


def register_dml_target(name: str, table: TransactionalTable) -> None:
    """Expose ``table`` to :func:`execute_dml` under ``name`` (what
    ``create_view`` does automatically for every registered view)."""
    _DML_TARGETS[name] = table


def _resolve_target(
    name: str, tables: dict[str, TransactionalTable] | None
) -> TransactionalTable:
    t = (tables or {}).get(name) or _DML_TARGETS.get(name)
    if t is None:
        known = sorted(set(tables or {}) | set(_DML_TARGETS))
        raise ValueError(
            f"unknown transactional table '{name}' — register it via "
            f"create_view()/register_dml_target() or pass tables=; "
            f"known: {known}"
        )
    return t


def _find_top_level_kw(text: str, kw: str) -> int:
    """Offset of the first TOP-LEVEL occurrence of keyword ``kw``
    (outside strings/parens, word-bounded), or -1."""
    return next(_scan_top_level(text, kw.upper()), -1)


def _split_replace_where(rest: str) -> tuple[str, str] | None:
    """Split ``<predicate> <query>`` (the text after ``REPLACE
    WHERE``) at the query boundary, parenthesis-aware — a naive
    ``(.+?)\\s+(SELECT|VALUES|\\()`` split breaks on predicates
    containing an IN-list or subquery (``x IN (1,2) SELECT ...``
    would mis-split at the '('). Rules:

    - a TOP-LEVEL ``SELECT``/``VALUES`` keyword always starts the
      query (inside a predicate those can only occur within subquery
      parens, i.e. at depth >= 1);
    - a top-level ``(`` whose content begins with ``SELECT``/
      ``VALUES`` starts a parenthesized query UNLESS the preceding
      token binds it to the predicate (``IN``/``EXISTS``/``ANY``/
      ``ALL``/``SOME`` or a comparison/arithmetic operator, e.g.
      ``x = (SELECT max(id) ...)``).

    - a candidate keyword must BEGIN a plausible query: ``VALUES``
      followed by ``(`` (a row constructor), ``SELECT`` not followed
      by a comparison operator — so a predicate referencing a column
      named ``values`` (``... AND values > 3 SELECT ...``) doesn't
      mis-split at the column reference.

    Returns ``(predicate, query)`` or ``None`` when no query boundary
    is found (caller raises the shape error)."""

    def _plausible(i: int, kw: str) -> bool:
        nxt = rest[i + len(kw):].lstrip()
        if not nxt:
            return False
        if kw == "VALUES":
            return nxt[0] == "("
        return nxt[0] not in "=<>!"  # 'select >= 3' is a predicate term

    cands = [i for i in _scan_top_level(rest, "SELECT") if _plausible(i, "SELECT")]
    cands += [i for i in _scan_top_level(rest, "VALUES") if _plausible(i, "VALUES")]
    n = len(rest)
    depth = 0
    in_str = False
    i = 0
    while i < n:
        ch = rest[i]
        if in_str:
            if ch == "'":
                in_str = i + 1 < n and rest[i + 1] == "'"
                if in_str:
                    i += 1
        elif ch == "'":
            in_str = True
        elif ch == "(":
            if depth == 0:
                inner = rest[i + 1 :].lstrip()
                if re.match(r"(?:SELECT|VALUES)\b", inner, re.I):
                    before = rest[:i].rstrip()
                    wm = re.search(r"([A-Za-z_]\w*)$", before)
                    bound_kw = wm and wm.group(1).upper() in (
                        "IN", "EXISTS", "ANY", "ALL", "SOME",
                    )
                    bound_op = bool(before) and before[-1] in "=<>!+-*/%,~^|&"
                    if not bound_kw and not bound_op:
                        cands.append(i)
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    starts = [c for c in cands if c > 0]
    if not starts:
        return None
    q = min(starts)
    pred = rest[:q].strip()
    if not pred:
        return None
    return pred, rest[q:].strip()


def _strip_alias(text: str, alias: str | None) -> str:
    """Remove ``alias.`` qualifiers outside string literals, so
    predicates/assignments written against ``UPDATE t AS a`` resolve
    on the bare frame."""
    if not alias:
        return text
    out = []
    pat = re.compile(rf"(?<![\w.]){re.escape(alias)}\.", re.I)
    for i, seg in enumerate(re.split(r"('(?:[^']|'')*')", text)):
        out.append(seg if i % 2 else pat.sub("", seg))
    return "".join(out)


_NAME = r"[A-Za-z_][\w.]*"
_ALIAS = rf"(?:\s+(?:AS\s+)?(?!USING\b|ON\b|SET\b|WHERE\b)([A-Za-z_]\w*))?"
# optional statement-level write-strategy hint on DELETE/UPDATE; the
# captured group is the hint body (or None)
_MOR_HINT = r"(?:/\*\+\s*(MERGE_ON_READ|COPY_ON_WRITE)\s*\*/\s+)?"


def _merge_on_read(t: TransactionalTable, hint: str | None) -> bool:
    """Resolve the DELETE/UPDATE write strategy: an explicit statement
    hint wins, else the table's ``merge_on_read`` property (the Delta
    ``enableDeletionVectors`` shape, set via ``ALTER TABLE ... SET
    TBLPROPERTIES (merge_on_read = true)``), else copy-on-write."""
    if hint is not None:
        return hint.upper() == "MERGE_ON_READ"
    return t.properties().get("merge_on_read", "").lower() == "true"


def _parse_relation(spark: SparkSession, rel: str) -> DataFrame:
    rel = rel.strip()
    if rel.startswith("("):
        return spark.sql(rel[1:-1])
    return spark.table(rel)


def _merge_keys(
    cond: str,
    talias: str | None,
    salias: str | None,
    names: tuple[str | None, ...] = (),
) -> list[str]:
    """Key columns from an equality-conjunction ON condition
    (``t.k = s.k AND ...``). Both sides must name the SAME column —
    the upsert operator keys on shared names, like Delta's
    ``ON t.k = s.k`` fast path. Qualifiers must be a declared alias or
    one of ``names`` (the bare table/source names — standard SQL
    allows either), and a conjunct must not compare a relation to
    itself."""
    keys = []
    known = {x for x in (talias, salias, *names) if x}
    for conj in _split_top_level(cond, "AND"):
        sides = conj.split("=")
        if len(sides) != 2:
            raise ValueError(
                f"MERGE ON supports equality conjunctions only, got: {conj!r}"
            )

        def _col(side: str) -> tuple[str | None, str]:
            s = side.strip().strip("()")
            m = re.fullmatch(r"(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)", s)
            if m is None:
                raise ValueError(
                    f"MERGE ON condition side is not a column: {side!r}"
                )
            return m.group(1), m.group(2)

        (qa, a), (qb, b) = _col(sides[0]), _col(sides[1])
        for q in (qa, qb):
            if q is not None and known and q not in known:
                raise ValueError(
                    f"MERGE ON qualifier {q!r} matches neither declared "
                    f"alias ({sorted(known)})"
                )
        if qa is not None and qa == qb:
            raise ValueError(
                f"MERGE ON conjunct compares {qa!r} to itself — one side "
                "must be the target, the other the source"
            )
        if a != b:
            raise ValueError(
                f"MERGE ON keys must share a column name (got {a!r} vs "
                f"{b!r}); alias the source column to the target's name"
            )
        keys.append(a)
    if not keys:
        raise ValueError("MERGE ON produced no key columns")
    return keys


_UPSERT_ALL = re.compile(
    r"^\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$",
    re.I | re.S,
)


def _canon_qualifiers(text: str, t_names: set[str], s_names: set[str]) -> str:
    """Normalize every ``<alias-or-name>.`` qualifier in a clause
    expression to the canonical ``t.`` / ``s.`` the merge operator
    resolves (outside string literals). Unknown qualifiers pass
    through untouched (struct field access)."""
    pat = re.compile(r"(?<![\w.'])([A-Za-z_]\w*)\s*\.", re.I)

    def repl(m: re.Match) -> str:
        q = m.group(1)
        if q in t_names or q.lower() in {n.lower() for n in t_names}:
            return "t."
        if q in s_names or q.lower() in {n.lower() for n in s_names}:
            return "s."
        return m.group(0)

    out = []
    for i, seg in enumerate(re.split(r"('(?:[^']|'')*')", text)):
        out.append(seg if i % 2 else pat.sub(repl, seg))
    return "".join(out)


def _outside_case(text: str, kw: str) -> list[int]:
    """Top-level offsets of keyword ``kw`` that are NOT inside a
    ``CASE ... END`` expression — a MERGE clause's WHEN/THEN must not
    be confused with the WHEN/THEN of a CASE inside a condition or
    SET expression. Tracks CASE/END nesting over top-level keyword
    offsets (CASE expressions are not parenthesized, so
    ``_scan_top_level``'s paren tracking alone cannot see them)."""
    marks = sorted(
        [(i, "case") for i in _scan_top_level(text, "CASE")]
        + [(i, "end") for i in _scan_top_level(text, "END")]
        + [(i, "kw") for i in _scan_top_level(text, kw.upper())]
    )
    depth = 0
    out: list[int] = []
    for i, kind in marks:
        if kind == "case":
            depth += 1
        elif kind == "end":
            depth = max(0, depth - 1)
        elif depth == 0:
            out.append(i)
    return out


def _split_cond_then(text: str) -> tuple[str | None, str]:
    """Split ``[AND <cond>] THEN <action>`` at the clause-level THEN —
    NOT a THEN belonging to a ``CASE WHEN ... THEN`` inside the
    condition."""
    for i in _outside_case(text, "THEN"):
        head = text[:i].strip()
        tail = text[i + 4 :].strip()
        if head:
            am = re.match(r"^AND\s+(.+)$", head, re.I | re.S)
            if am is None:
                raise ValueError(
                    f"MERGE clause: expected [AND <cond>] THEN, got "
                    f"{head[:60]!r}"
                )
            return am.group(1).strip(), tail
        return None, tail
    raise ValueError(f"MERGE clause missing THEN: {text[:60]!r}")


def _parse_merge_action(act: str, canon) -> dict:
    """Parse the post-THEN action of one MERGE clause into the
    ``operators/merge.py:merge_clauses`` dict form."""
    a = act.strip()
    if re.fullmatch(r"DELETE", a, re.I):
        return {"action": "delete"}
    m = re.match(r"^UPDATE\s+SET\s+(.+)$", a, re.I | re.S)
    if m is not None:
        body = m.group(1).strip()
        if body == "*":
            return {"action": "update", "set": "*"}
        assignments: dict[str, str] = {}
        for item in _split_top_level(body, ","):
            am = re.match(
                r"^\s*(?:[A-Za-z_]\w*\s*\.\s*)?([A-Za-z_]\w*)\s*=\s*(.+)$",
                item,
                re.S,
            )
            if am is None:
                raise ValueError(f"unparseable MERGE SET assignment: {item!r}")
            assignments[am.group(1)] = canon(am.group(2).strip())
        return {"action": "update", "set": assignments}
    m = re.match(
        r"^INSERT\s*(?:\*|\(([^)]*)\)\s*VALUES\s*\((.+)\))$", a, re.I | re.S
    )
    if m is not None:
        if m.group(1) is None:
            return {"action": "insert", "values": "*"}
        cols = [c.strip().strip("`") for c in m.group(1).split(",")]
        exprs = _split_top_level(m.group(2), ",")
        if len(cols) != len(exprs):
            raise ValueError(
                f"MERGE INSERT arity mismatch: {len(cols)} columns vs "
                f"{len(exprs)} values"
            )
        return {
            "action": "insert",
            "values": {c: canon(e) for c, e in zip(cols, exprs)},
        }
    raise ValueError(
        f"unparseable MERGE action (expected UPDATE SET ... | DELETE | "
        f"INSERT * | INSERT (cols) VALUES (...)): {a[:80]!r}"
    )


def _parse_merge_clauses(
    text: str, t_names: set[str], s_names: set[str]
) -> list[dict]:
    """Parse the full WHEN-clause tail of a MERGE statement:

    - ``WHEN MATCHED [AND <cond>] THEN UPDATE SET c=expr,... | UPDATE
      SET * | DELETE``
    - ``WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN INSERT * |
      INSERT (cols) VALUES (exprs)``
    - ``WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ... |
      DELETE``

    Clauses keep statement order (first-match-wins per group, standard
    MERGE). An UNconditional clause followed by another clause in the
    SAME group is rejected — the later clause could never fire, which
    is a statement bug, not a preference."""

    def canon(e: str) -> str:
        return _canon_qualifiers(e, t_names, s_names)

    offsets = _outside_case(text, "WHEN")
    if not offsets or text[: offsets[0]].strip():
        raise ValueError(
            f"MERGE clauses must start at WHEN, got: {text[:60]!r}"
        )
    clauses: list[dict] = []
    for i, start in enumerate(offsets):
        seg = text[
            start : offsets[i + 1] if i + 1 < len(offsets) else len(text)
        ].strip()
        m = re.match(
            r"^WHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED"
            r"(?:\s+BY\s+TARGET)?|MATCHED)\b(.*)$",
            seg,
            re.I | re.S,
        )
        if m is None:
            raise ValueError(f"unparseable MERGE clause head: {seg[:60]!r}")
        kw = re.sub(r"\s+", " ", m.group(1).upper())
        when = {
            "MATCHED": "matched",
            "NOT MATCHED": "not_matched",
            "NOT MATCHED BY TARGET": "not_matched",
            "NOT MATCHED BY SOURCE": "not_matched_by_source",
        }[kw]
        cond, act = _split_cond_then(m.group(2).strip())
        clause = {"when": when, "cond": canon(cond) if cond else None}
        clause.update(_parse_merge_action(act, canon))
        if when == "not_matched" and clause["action"] != "insert":
            raise ValueError(
                "WHEN NOT MATCHED supports INSERT only (there is no "
                "target row to update or delete)"
            )
        if when == "not_matched_by_source" and clause["action"] == "insert":
            raise ValueError(
                "WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE only "
                "(there is no source row to insert from)"
            )
        clauses.append(clause)
    seen_unconditional: set[str] = set()
    for c in clauses:
        if c["when"] in seen_unconditional:
            raise ValueError(
                f"unreachable MERGE clause: an unconditional WHEN "
                f"{c['when'].replace('_', ' ').upper()} clause precedes it"
            )
        if c["cond"] is None:
            seen_unconditional.add(c["when"])
    return clauses


def execute_dml(
    spark: SparkSession,
    statement: str,
    tables: dict[str, TransactionalTable] | None = None,
) -> dict:
    """Execute one DML ``statement`` against transactional tables and
    return the routed operator's result dict (plus ``op`` and
    ``table``). See the module docstring for the four supported
    shapes; anything else raises ``ValueError`` with the reason."""
    s = statement.strip().rstrip(";").strip()
    head = s.split(None, 1)[0].upper() if s else ""
    if head == "MERGE":
        m = re.match(
            rf"^MERGE\s+{_MOR_HINT}INTO\s+({_NAME}){_ALIAS}\s+USING\s+",
            s,
            re.I | re.S,
        )
        if m is None:
            raise ValueError(f"unparseable MERGE INTO head: {s[:80]!r}")
        hint, target, talias = m.group(1), m.group(2), m.group(3)
        rest = s[m.end() :]
        # source relation: a parenthesized subquery or a name
        if rest.lstrip().startswith("("):
            rest = rest.lstrip()
            depth = 0
            in_str = False
            for i, ch in enumerate(rest):
                if in_str:
                    in_str = ch != "'"
                elif ch == "'":
                    in_str = True
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
            src, rest = rest[: i + 1], rest[i + 1 :]
        else:
            sm = re.match(rf"\s*({_NAME})", rest)
            if sm is None:
                raise ValueError(
                    "MERGE: expected a source relation after USING"
                )
            src, rest = sm.group(1), rest[sm.end() :]
        sm = re.match(rf"^{_ALIAS}\s+ON\s+", rest, re.I | re.S)
        if sm is None:
            raise ValueError("MERGE: expected [AS alias] ON <condition>")
        salias = sm.group(1)
        rest = rest[sm.end() :]
        on_end = _find_top_level_kw(rest, "WHEN")
        if on_end < 0:
            raise ValueError("MERGE: expected WHEN MATCHED ... clauses")
        cond, clause_text = rest[:on_end], rest[on_end:]
        t = _resolve_target(target, tables)
        keys = _merge_keys(  # shape-check before I/O
            cond,
            talias,
            salias,
            names=(target, src if not src.startswith("(") else None),
        )
        updates = _parse_relation(spark, src)
        if _UPSERT_ALL.match(clause_text):
            # upsert-all fast path: the latest-wins whole-row operator
            # (identical result to the clause form, fewer CASE arms).
            # The write strategy resolves like DELETE/UPDATE: statement
            # hint wins, else the merge_on_read table property — the DV
            # path soft-deletes matched positions and appends O(batch).
            version = t.merge(
                spark,
                updates,
                keys,
                merge_on_read=_merge_on_read(t, hint),
            )
            return {"op": "merge", "table": target, "version": version}
        t_names = {x for x in (talias, target) if x}
        s_names = {
            x
            for x in (salias, src if not src.startswith("(") else None)
            if x
        }
        clauses = _parse_merge_clauses(clause_text, t_names, s_names)
        # clause form resolves the write strategy exactly like the
        # upsert form: statement hint wins, else the merge_on_read
        # table property. TransactionalTable.merge itself falls back
        # to copy-on-write for the two shapes a DV cannot express
        # (NOT MATCHED BY SOURCE clauses, NULL source merge keys).
        version = t.merge(
            spark,
            updates,
            keys,
            clauses=clauses,
            merge_on_read=_merge_on_read(t, hint),
        )
        return {
            "op": "merge",
            "table": target,
            "version": version,
            "clauses": [
                {"when": c["when"], "action": c["action"]} for c in clauses
            ],
        }
    if head == "DELETE":
        m = re.match(
            rf"^DELETE\s+{_MOR_HINT}FROM\s+({_NAME}){_ALIAS}\s+WHERE\s+(.+)$",
            s,
            re.I | re.S,
        )
        if m is None:
            raise ValueError(
                "DELETE shape: DELETE [/*+ MERGE_ON_READ */] FROM <table> "
                "[AS a] WHERE <predicate> (an unconstrained DELETE must be "
                "an explicit truncation commit)"
            )
        hint, target, alias, pred = (
            m.group(1),
            m.group(2),
            m.group(3),
            m.group(4),
        )
        t = _resolve_target(target, tables)
        res = t.delete_where(
            spark,
            _strip_alias(pred, alias),
            merge_on_read=_merge_on_read(t, hint),
        )
        return {"op": "delete", "table": target, **res}
    if head == "UPDATE":
        m = re.match(
            rf"^UPDATE\s+{_MOR_HINT}({_NAME}){_ALIAS}\s+SET\s+",
            s,
            re.I | re.S,
        )
        if m is None:
            raise ValueError(
                "UPDATE shape: UPDATE [/*+ MERGE_ON_READ */] <table> [AS a] "
                "SET c = expr, ... [WHERE <predicate>]"
            )
        hint, target, alias = m.group(1), m.group(2), m.group(3)
        rest = s[m.end() :]
        w = _find_top_level_kw(rest, "WHERE")
        set_part, pred = (rest, None) if w < 0 else (rest[:w], rest[w + 5 :])
        assignments = {}
        for item in _split_top_level(set_part, ","):
            am = re.match(r"^\s*(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\s*=\s*(.+)$",
                          item, re.S)
            if am is None:
                raise ValueError(f"unparseable SET assignment: {item!r}")
            assignments[am.group(1)] = _strip_alias(am.group(2).strip(), alias)
        t = _resolve_target(target, tables)
        res = t.update_where(
            spark,
            assignments,
            _strip_alias(pred, alias) if pred else None,
            merge_on_read=_merge_on_read(t, hint),
        )
        return {"op": "update", "table": target, **res}
    if head == "INSERT":
        # Delta's predicate overwrite: INSERT INTO t REPLACE WHERE
        # <pred> <query> — atomically replace the matching region with
        # the query's rows (txtable.replace_where). The predicate/query
        # boundary is found parenthesis-aware (_split_replace_where) so
        # predicates with IN-lists or subqueries split correctly.
        replace_pred: str | None = None
        rw = re.match(
            rf"^INSERT\s+INTO\s+({_NAME})\s+REPLACE\s+WHERE\s+(.+)$",
            s,
            re.I | re.S,
        )
        if rw is not None:
            split = _split_replace_where(rw.group(2))
            if split is None:
                raise ValueError(
                    "INSERT ... REPLACE WHERE shape: could not find the "
                    "query boundary — expected REPLACE WHERE <predicate> "
                    "followed by SELECT/VALUES/(<query>) at top level"
                )
            target, (replace_pred, q) = rw.group(1), split
        else:
            m = re.match(
                rf"^INSERT\s+INTO\s+({_NAME})\s+(.+)$", s, re.I | re.S
            )
            if m is None:
                raise ValueError(
                    "INSERT shape: INSERT INTO <table> [REPLACE WHERE "
                    "<pred>] <query>"
                )
            target, q = m.group(1), m.group(2).strip()
        t = _resolve_target(target, tables)
        df = spark.sql(q[1:-1] if q.startswith("(") and q.endswith(")") else q)
        cur = t.manifest()
        schema = (cur or {}).get("schema")
        # GENERATED ALWAYS AS: an INSERT omitting a generated column
        # derives it here, so by-name matching sees full coverage (the
        # write gate still verifies equality if the query supplied it)
        gen = (cur or {}).get("meta", {}).get("generated_columns") or {}
        if gen and schema:
            from pyspark.sql import functions as F

            for g, e in gen.items():
                if g not in df.columns and g in schema:
                    df = df.withColumn(g, F.expr(e).cast(schema[g]))
        if schema:
            # standard INSERT semantics: the query's columns are
            # matched BY NAME when every table column appears, else BY
            # POSITION when the arity matches (unaliased literal
            # selects), and cast to the table's types (literal
            # inference like 1.5 → decimal must not fail an append).
            # Position comes from the READER-visible column order (the
            # manifest schema dict is JSON-sorted, not positional).
            from pyspark.sql import functions as F

            try:
                tbl_cols = t.read(spark).columns
                positional_ok = True
            except FileNotFoundError:
                # head snapshot lists no files (explicit truncation):
                # there is no physical column order to honor, so only
                # BY-NAME matching is sound (the schema dict is
                # JSON-sorted, not positional)
                tbl_cols = list(schema)
                positional_ok = False
            if set(df.columns) == set(tbl_cols):
                df = df.select(
                    *[F.col(c).cast(schema[c]).alias(c) for c in tbl_cols]
                )
            elif positional_ok and len(df.columns) == len(tbl_cols):
                # backtick-quote: unaliased literal selects generate
                # column names like "CAST(1.5 AS DOUBLE)" that F.col
                # would otherwise parse as a dotted path
                df = df.select(
                    *[
                        F.col(f"`{df.columns[i]}`")
                        .cast(schema[c])
                        .alias(c)
                        for i, c in enumerate(tbl_cols)
                    ]
                )
            else:
                raise ValueError(
                    f"INSERT INTO {target}: query columns {df.columns} do "
                    f"not cover the table schema {tbl_cols} by name "
                    "or by position"
                )
        if replace_pred is not None:
            res = t.replace_where(spark, df, replace_pred)
            return {
                "op": "replace_where",
                "table": target,
                "predicate": replace_pred,
                **res,
            }
        version = t.commit(
            df,
            mode="append",
            partition_by=(cur or {}).get("partition_by"),
        )
        return {"op": "insert", "table": target, "version": version}
    if head == "CREATE":
        mc = re.match(
            rf"^CREATE\s+TABLE\s+({_NAME})\s+LOCATION\s+'((?:[^']|'')+)'"
            rf"\s+(SHALLOW|DEEP)\s+CLONE\s+({_NAME})"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?$",
            s,
            re.I,
        )
        if mc is not None:
            # Delta's CREATE TABLE ... SHALLOW|DEEP CLONE: shallow is
            # an O(metadata) commit referencing the source snapshot's
            # files in place; deep copies them under the clone's root
            # first (resume-safe), so the clone is self-contained
            name, path, kind, src_name, ver = (
                mc.group(1),
                mc.group(2).replace("''", "'"),
                mc.group(3).lower(),
                mc.group(4),
                mc.group(5),
            )
            src = _resolve_target(src_name, tables)
            t = TransactionalTable(path)
            version = t.clone_from(
                src,
                version=int(ver) if ver is not None else None,
                deep=(kind == "deep"),
            )
            register_dml_target(name, t)
            t.create_view(spark, name)
            return {
                "op": "clone",
                "clone_kind": kind,
                "table": name,
                "path": path,
                "source": src_name,
                "source_version": t.manifest()["meta"]["clone_version"],
                "version": version,
            }
        m = re.match(
            rf"^CREATE\s+TABLE\s+({_NAME})\s+LOCATION\s+'((?:[^']|'')+)'"
            rf"(?:\s+PARTITIONED\s+BY\s+\(([^)]+)\))?"
            rf"\s+AS\s+(.+)$",
            s,
            re.I | re.S,
        )
        if m is None:
            raise ValueError(
                "CREATE shape: CREATE TABLE <name> LOCATION '<path>' "
                "[PARTITIONED BY (col, ...)] AS <query> | "
                "CREATE TABLE <name> LOCATION '<path>' SHALLOW|DEEP "
                "CLONE <table> [VERSION AS OF <n>]"
            )
        name, path, pb, q = (
            m.group(1),
            m.group(2).replace("''", "'"),
            m.group(3),
            m.group(4).strip(),
        )
        t = TransactionalTable(path)
        if t.exists():
            raise ValueError(
                f"CREATE TABLE {name}: a transactional table already "
                f"exists at {path!r} (INSERT INTO appends; replace via "
                "the commit API)"
            )
        df = spark.sql(q[1:-1] if q.startswith("(") and q.endswith(")") else q)
        version = t.commit(
            df,
            partition_by=(
                [c.strip().strip("`") for c in pb.split(",")] if pb else None
            ),
        )
        register_dml_target(name, t)
        t.create_view(spark, name)
        return {
            "op": "create_table",
            "table": name,
            "path": path,
            "version": version,
        }
    if head == "OPTIMIZE":
        m = re.match(
            rf"^OPTIMIZE\s+({_NAME})"
            rf"(?:(\s+INCREMENTAL)|\s+ZORDER\s+BY\s+\(([^)]+)\)"
            rf"|(\s+PURGE(?:\s+DELETES)?)"
            rf"|(\s+COMPACT\s+DELETES))?$",
            s,
            re.I,
        )
        if m is None:
            raise ValueError(
                "OPTIMIZE shape: OPTIMIZE <table> "
                "[INCREMENTAL | ZORDER BY (col, ...) | PURGE [DELETES] "
                "| COMPACT DELETES]"
            )
        t = _resolve_target(m.group(1), tables)
        if m.group(2):
            res = t.optimize_incremental(spark)
        elif m.group(3):
            res = t.optimize(
                spark,
                zorder_by=[c.strip().strip("`") for c in m.group(3).split(",")],
            )
        elif m.group(4):
            # materialize deletion vectors away (REORG ... APPLY (PURGE))
            res = t.purge_deletion_vectors(spark)
        elif m.group(5):
            # collapse stacked sidecar refs, stats-only (no rewrite)
            res = t.compact_deletion_vectors(spark)
        else:
            res = t.optimize(spark)
        return {"op": "optimize", "table": m.group(1), **res}
    if head == "VACUUM":
        m = re.match(
            rf"^VACUUM\s+({_NAME})(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?"
            rf"(\s+DRY\s+RUN)?$",
            s,
            re.I,
        )
        if m is None:
            raise ValueError(
                "VACUUM shape: VACUUM <table> [RETAIN <n> VERSIONS] "
                "[DRY RUN]"
            )
        t = _resolve_target(m.group(1), tables)
        res = t.vacuum(
            retain_versions=int(m.group(2)) if m.group(2) else 2,
            dry_run=bool(m.group(3)),
        )
        return {"op": "vacuum", "table": m.group(1), **res}
    if head == "SHOW":
        m = re.match(rf"^SHOW\s+PARTITIONS\s+({_NAME})$", s, re.I)
        if m is None:
            raise ValueError("SHOW shape: SHOW PARTITIONS <table>")
        t = _resolve_target(m.group(1), tables)
        mf = t.manifest()
        if mf is None:
            raise FileNotFoundError(
                f"{m.group(1)}: no committed version to list partitions of"
            )
        stats = mf.get("stats", {})
        parts = sorted(
            {
                tuple(sorted(stats[f]["partition"].items()))
                for f in mf["files"]
                if "partition" in stats.get(f, {})
            }
        )
        return {
            "op": "show_partitions",
            "table": m.group(1),
            "partition_by": mf.get("partition_by"),
            # manifest-only: the partition index IS the metadata — no
            # directory listing, no files opened
            "partitions": [dict(p) for p in parts],
        }
    if head == "DESCRIBE":
        m = re.match(rf"^DESCRIBE\s+(HISTORY|DETAIL)\s+({_NAME})$", s, re.I)
        if m is None:
            raise ValueError(
                "DESCRIBE shape: DESCRIBE HISTORY <table> | "
                "DESCRIBE DETAIL <table>"
            )
        t = _resolve_target(m.group(2), tables)
        if m.group(1).upper() == "DETAIL":
            return {
                "op": "describe_detail",
                "table": m.group(2),
                "detail": t.describe(),
            }
        return {
            "op": "describe_history",
            "table": m.group(2),
            "history": t.history(),
        }
    if head == "ALTER":
        pm = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+SET\s+TBLPROPERTIES\s*\((.+)\)$",
            s,
            re.I | re.S,
        )
        if pm is not None:
            t = _resolve_target(pm.group(1), tables)
            props: dict[str, str] = {}
            for item in _split_top_level(pm.group(2), ","):
                am = re.match(
                    r"^\s*(?:'((?:[^']|'')*)'|`?([\w.]+)`?)\s*=\s*"
                    r"(?:'((?:[^']|'')*)'|(\S+))\s*$",
                    item,
                    re.S,
                )
                if am is None:
                    raise ValueError(f"unparseable TBLPROPERTIES item: {item!r}")
                key = (am.group(1) or am.group(2)).replace("''", "'")
                val = (
                    am.group(3).replace("''", "'")
                    if am.group(3) is not None
                    else am.group(4)
                )
                props[key] = val
            version = t.set_properties(props)
            return {
                "op": "set_properties",
                "table": pm.group(1),
                "properties": t.properties(),
                "version": version,
            }
        gcm = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+ADD\s+COLUMN\s+"
            rf"`?([A-Za-z_]\w*)`?\s+([A-Za-z_]\w*(?:\s*\([\d\s,]*\))?)\s+"
            rf"GENERATED\s+ALWAYS\s+AS\s*\((.+)\)$",
            s,
            re.I | re.S,
        )
        if gcm is not None:
            t = _resolve_target(gcm.group(1), tables)
            version = t.add_generated_column(
                spark,
                gcm.group(2),
                gcm.group(3).strip(),
                gcm.group(4).strip(),
            )
            return {
                "op": "add_generated_column",
                "table": gcm.group(1),
                "column": gcm.group(2),
                "expr": gcm.group(4).strip(),
                "version": version,
            }
        rcm = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+RENAME\s+COLUMN\s+"
            rf"`?([A-Za-z_]\w*)`?\s+TO\s+`?([A-Za-z_]\w*)`?$",
            s,
            re.I,
        )
        if rcm is not None:
            # Delta's column-mapping rename: metadata-only, physical
            # page names unchanged (txtable.rename_column)
            t = _resolve_target(rcm.group(1), tables)
            version = t.rename_column(rcm.group(2), rcm.group(3))
            return {
                "op": "rename_column",
                "table": rcm.group(1),
                "from": rcm.group(2),
                "to": rcm.group(3),
                "version": version,
            }
        dclm = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+DROP\s+COLUMN\s+"
            rf"`?([A-Za-z_]\w*)`?$",
            s,
            re.I,
        )
        if dclm is not None:
            t = _resolve_target(dclm.group(1), tables)
            version = t.drop_column(dclm.group(2))
            return {
                "op": "drop_column",
                "table": dclm.group(1),
                "column": dclm.group(2),
                "version": version,
            }
        acm = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+ADD\s+CONSTRAINT\s+"
            rf"`?([A-Za-z_]\w*)`?\s+CHECK\s*\((.+)\)$",
            s,
            re.I | re.S,
        )
        if acm is not None:
            # Delta's CHECK-constraint shape: sticky, validated against
            # the existing snapshot, enforced fail-closed on every
            # subsequent commit path (txtable.add_constraint)
            t = _resolve_target(acm.group(1), tables)
            version = t.add_constraint(
                spark, acm.group(2), acm.group(3).strip()
            )
            return {
                "op": "add_constraint",
                "table": acm.group(1),
                "name": acm.group(2),
                "constraints": t.constraints(),
                "version": version,
            }
        dcm = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+DROP\s+CONSTRAINT\s+"
            rf"`?([A-Za-z_]\w*)`?$",
            s,
            re.I,
        )
        if dcm is not None:
            t = _resolve_target(dcm.group(1), tables)
            version = t.drop_constraint(dcm.group(2))
            return {
                "op": "drop_constraint",
                "table": dcm.group(1),
                "name": dcm.group(2),
                "constraints": t.constraints(),
                "version": version,
            }
        evm = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+"
            rf"(?:PARTITIONED\s+BY\s*\(([^)]*)\)|DROP\s+PARTITIONING)$",
            s,
            re.I,
        )
        if evm is not None:
            # partition EVOLUTION: metadata-only, future writes use the
            # new scheme, old files read under their own recorded values
            t = _resolve_target(evm.group(1), tables)
            cols = (
                [c.strip().strip("`") for c in evm.group(2).split(",") if c.strip()]
                if evm.group(2) is not None
                else []
            )
            version = t.alter_partitioning(spark, cols or None)
            return {
                "op": "alter_partitioning",
                "table": evm.group(1),
                "partition_by": cols or None,
                "version": version,
            }
        wm = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+ALTER\s+COLUMN\s+"
            rf"`?([A-Za-z_]\w*)`?\s+TYPE\s+([A-Za-z_]\w*(?:\s*\([\d\s,]*\))?)$",
            s,
            re.I,
        )
        if wm is not None:
            t = _resolve_target(wm.group(1), tables)
            version = t.alter_column_type(
                spark, wm.group(2), wm.group(3).strip()
            )
            return {
                "op": "alter_column_type",
                "table": wm.group(1),
                "column": wm.group(2),
                "type": wm.group(3).strip().lower(),
                "version": version,
            }
        # greedy to the FINAL ')': column types may themselves be
        # parenthesized (decimal(10,2), varchar(64)); the comma split
        # below is paren-aware so nested commas stay inside their type
        m = re.match(
            rf"^ALTER\s+TABLE\s+({_NAME})\s+ADD\s+COLUMNS?\s*\((.+)\)$",
            s,
            re.I | re.S,
        )
        if m is None:
            raise ValueError(
                "ALTER shape: ALTER TABLE <table> ADD COLUMNS "
                "(col type, ...) | ALTER TABLE <table> ALTER COLUMN <c> "
                "TYPE <t> | ALTER TABLE <table> SET TBLPROPERTIES "
                "(k = v, ...) | ALTER TABLE <table> PARTITIONED BY "
                "(col, ...) | ALTER TABLE <table> DROP PARTITIONING | "
                "ALTER TABLE <table> ADD CONSTRAINT <name> CHECK (expr) "
                "| ALTER TABLE <table> DROP CONSTRAINT <name> | "
                "ALTER TABLE <table> RENAME COLUMN <a> TO <b> | "
                "ALTER TABLE <table> DROP COLUMN <c>"
            )
        t = _resolve_target(m.group(1), tables)
        columns: dict[str, str] = {}
        for item in _split_top_level(m.group(2), ","):
            cm = re.match(r"^\s*`?([A-Za-z_]\w*)`?\s+(.+?)\s*$", item, re.S)
            if cm is None:
                raise ValueError(f"unparseable column definition: {item!r}")
            columns[cm.group(1)] = cm.group(2)
        version = t.add_columns(spark, columns)
        return {
            "op": "add_columns",
            "table": m.group(1),
            "added": sorted(columns),
            "version": version,
        }
    if head == "RESTORE":
        m = re.match(
            rf"^RESTORE\s+TABLE\s+({_NAME})\s+TO\s+"
            rf"(?:VERSION\s+AS\s+OF\s+(\d+)|"
            rf"TIMESTAMP\s+AS\s+OF\s+('(?:[^']|'')*'|\d+(?:\.\d+)?))$",
            s,
            re.I,
        )
        if m is None:
            raise ValueError(
                "RESTORE shape: RESTORE TABLE <table> TO VERSION AS OF <n> "
                "| TO TIMESTAMP AS OF <instant>"
            )
        t = _resolve_target(m.group(1), tables)
        version = (
            int(m.group(2))
            if m.group(2) is not None
            else t.version_as_of(_resolve_asof_epoch(m.group(3)))
        )
        new_version = t.restore(version)
        return {
            "op": "restore",
            "table": m.group(1),
            "restored_to": version,
            "version": new_version,
        }
    raise ValueError(
        f"unsupported DML statement (expected MERGE/UPDATE/DELETE/INSERT/"
        f"OPTIMIZE/VACUUM/DESCRIBE HISTORY/RESTORE TABLE/ALTER TABLE/"
        f"SHOW PARTITIONS): "
        f"{s[:80]!r}"
    )


def _outside_string(text: str, pos: int) -> bool:
    """True when ``pos`` is outside single-quoted SQL string literals
    ('' escaping counts as two delimiters, so plain parity works)."""
    return text.count("'", 0, pos) % 2 == 0


_TRAVEL = re.compile(
    rf"(?<![\w.])({_NAME})\s+(?:(VERSION)\s+AS\s+OF\s+(\d+)|"
    rf"(TIMESTAMP)\s+AS\s+OF\s+('(?:[^']|'')*'|\d+(?:\.\d+)?))",
    re.I,
)


def _resolve_asof_epoch(lit: str) -> float:
    """Epoch seconds for a TIMESTAMP AS OF literal: a number, or an
    ISO datetime string (naive = UTC — a storage-layer clause must not
    change meaning with the submitting process's timezone; same
    convention as txstream's startingtimestamp)."""
    if not lit.startswith("'"):
        return float(lit)
    import datetime

    dt = datetime.datetime.fromisoformat(lit[1:-1].replace("''", "'"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return dt.timestamp()


def rewrite_time_travel(
    spark: SparkSession,
    statement: str,
    tables: dict[str, TransactionalTable] | None = None,
) -> str:
    """Replace every ``<name> VERSION AS OF <n>`` / ``<name> TIMESTAMP
    AS OF <instant>`` clause on a REGISTERED transactional name with a
    temp view pinned to that snapshot, returning the rewritten text.
    Names that don't resolve to a transactional table are left alone
    (they may be Spark catalog tables with their own travel support);
    matches inside string literals are never rewritten. The pinned
    view is per (name, version) and idempotent to re-register, so a
    statement joining several snapshots of one table works."""

    def _sub(m: re.Match) -> str:
        if not _outside_string(statement, m.start()):
            return m.group(0)
        name = m.group(1)
        t = (tables or {}).get(name) or _DML_TARGETS.get(name)
        if t is None:
            return m.group(0)
        if m.group(2):  # VERSION AS OF
            version = int(m.group(3))
        else:  # TIMESTAMP AS OF
            version = t.version_as_of(_resolve_asof_epoch(m.group(5)))
        view = f"__asof_{name}_{version}".replace(".", "_")
        t.read(spark, version=version).createOrReplaceTempView(view)
        return view

    return _TRAVEL.sub(_sub, statement)


_TVF = re.compile(
    r"(?<!\w)table_changes\(\s*'((?:[^']|'')+)'\s*,\s*(\d+)"
    r"(?:\s*,\s*(\d+))?(?:\s*,\s*'((?:[^']|'')*)')?\s*\)",
    re.I,
)


def rewrite_table_changes(
    spark: SparkSession,
    statement: str,
    tables: dict[str, TransactionalTable] | None = None,
) -> str:
    """Replace ``table_changes('name', from [, to] [, 'k1,k2'])``
    calls (Delta's CDF table-valued function, extended with an
    optional key list) with a temp view over
    :meth:`TransactionalTable.changes`. Our change feed is a
    snapshot diff, so it is keyed: the key columns come from the
    trailing string argument, else the table's sticky clustering
    columns (the declared row identity); neither present is a loud
    error, never a guessed join key."""

    def _sub(m: re.Match) -> str:
        if not _outside_string(statement, m.start()):
            return m.group(0)
        name = m.group(1).replace("''", "'")
        t = _resolve_target(name, tables)
        lo = int(m.group(2))
        hi = int(m.group(3)) if m.group(3) is not None else None
        if m.group(4):
            keys = [k.strip() for k in m.group(4).split(",") if k.strip()]
        else:
            clustering = ((t.manifest() or {}).get("meta", {}) or {}).get(
                "clustering"
            )
            keys = (clustering or {}).get("cols")
            if not keys:
                raise ValueError(
                    f"table_changes('{name}', ...): the change feed is a "
                    "keyed snapshot diff — pass the key columns as a "
                    "trailing 'k1,k2' argument, or cluster the table so "
                    "its row identity is declared"
                )
        view = f"__cdf_{name}_{lo}_{'head' if hi is None else hi}".replace(
            ".", "_"
        )
        t.changes(spark, list(keys), lo, hi).createOrReplaceTempView(view)
        return view

    return _TVF.sub(_sub, statement)


def _refresh_head_views(
    spark: SparkSession,
    statement: str,
    tables: dict[str, TransactionalTable] | None,
) -> None:
    """Re-pin the temp view of every REGISTERED transactional name the
    statement references bare (no travel clause — those were already
    rewritten away) at the table's current head. This is what makes
    ``execute_sql`` reads see prior DML through the same name —
    Delta's read-the-latest-snapshot semantics — instead of the stale
    snapshot the view happened to pin when it was first registered
    (``create_view`` docs: a view is an immutable snapshot plan;
    re-register to follow the head). One manifest read per referenced
    name; names whose tables have no committed version are skipped
    (Spark will raise its own resolution error if the name is
    genuinely unknown)."""
    for name, t in {**_DML_TARGETS, **(tables or {})}.items():
        for m in re.finditer(
            rf"(?<![\w.]){re.escape(name)}(?![\w.])", statement
        ):
            if _outside_string(statement, m.start()):
                try:
                    t.create_view(spark, name)
                except FileNotFoundError:
                    pass
                break


def execute_sql(
    spark: SparkSession,
    statement: str,
    tables: dict[str, TransactionalTable] | None = None,
):
    """The SQL front door's single entry point: rewrite time-travel
    clauses and ``table_changes`` TVF calls on registered
    transactional names, then run the statement — SELECT/WITH through
    ``spark.sql`` (returns the DataFrame), everything else through
    :func:`execute_dml` (returns its result dict). Both rewrites also
    apply inside DML source queries. Bare references to registered
    names in SELECTs re-pin their views at the table head first, so a
    statement sequence reads its own writes (each SELECT is still one
    consistent snapshot per table — MVCC, never a torn read)."""
    s = rewrite_time_travel(spark, statement, tables)
    s = rewrite_table_changes(spark, s, tables)
    # refresh for DML too: the operators act on the table HEAD either
    # way, but an embedded source query (MERGE ... USING (SELECT ...
    # FROM t)) resolves through the view and must see the same head
    _refresh_head_views(spark, s, tables)
    head = s.strip().split(None, 1)[0].upper() if s.strip() else ""
    if head in ("SELECT", "WITH"):
        return spark.sql(s.strip().rstrip(";"))
    return execute_dml(spark, s, tables)
