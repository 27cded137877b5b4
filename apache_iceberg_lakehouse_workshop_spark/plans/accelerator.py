"""Accelerator registry — the engine's twin of Dremio reflections (R7).

The reference registers materialized accelerations on datasets and the
platform transparently substitutes them at query time:
``ALTER DATASET dremio.demo.customer_spend CREATE REFLECTION
customer_spend_reflection USING RAW`` (``/root/reference/readme.md:320-329``)
with autonomous refresh/retire management (``readme.md:334-355,381-389``).

OSS Catalyst has no materialized-view substitution rule, so the engine
implements acceleration at the API layer (SURVEY §4 R7 plan):

- ``create_reflection(name, df)`` materializes the DataFrame into a
  :class:`~.lakeshim.Lakehouse` table and records which *anchor* lakehouse
  tables (and their snapshot ids) it was derived from.
- ``resolve(name)`` returns the materialized table **iff fresh** (every
  anchor table is still at the recorded snapshot), else recomputes from the
  definition — the "transparent substitution" contract: callers always get
  correct results; acceleration is best-effort.
- ``refresh(name)`` recomputes and re-records anchors (Dremio's
  refresh-on-data-change, readme.md:383-389).
- ``status()`` lists reflections with freshness — the observability the
  reference exposes in its reflection UI.

A result-cache variant (R10) falls out for free: a reflection over a *query*
keyed by its SQL text is exactly hash(SQL, snapshot ids) → cached table.

Scale: the materialized table is ordinary partitioned parquet — serving a
reflection is a plain scan, strictly cheaper than recomputing the view; the
freshness check reads only metadata JSON (O(anchors), no data IO).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lakeshim import Lakehouse

_REFLECTION_NS = "_reflections"


class AcceleratorRegistry:
    def __init__(self, lake: Lakehouse):
        self.lake = lake
        self.lake.create_namespace(_REFLECTION_NS)
        # optional hook run before executing a SQL-defined reflection's
        # definition: hosts whose SQL resolves against session temp views
        # (ScriptRunner) re-register them here, so refresh()/resolve()
        # called OUTSIDE a script never materialize a stale view of the
        # anchors while recording their current snapshot ids
        self.prepare_sql: Callable[[], None] | None = None
        # optional hook: is this dataset name a (logical) view of the host
        # SQL surface? Incremental AGGREGATE refresh must refuse shapes
        # registered over views — a view's rows are derived/filtered, so
        # merging the raw anchor's delta would corrupt the stored partials
        self.is_view: Callable[[str], bool] | None = None
        # optional hook: current body SQL of a (possibly leaf-named)
        # logical view, or None if not a view. Shapes registered over a
        # view record the body at registration; routing compares it with
        # the CURRENT body and refuses on drift — is_fresh only watches
        # anchor snapshots, so a redefined view with unchanged anchors
        # would otherwise serve the OLD definition's materialization
        self.view_body: Callable[[str], str | None] | None = None
        # optional hook: canonical full name for a dataset reference
        # (resolves leaf view names); tables default to _resolve_dataset
        self.canonical_dataset: Callable[[str], str | None] | None = None
        # name -> (definition thunk, anchor table names)
        self._defs: dict[str, tuple[Callable[[], DataFrame], list[str]]] = {}
        # name -> {anchor: snapshot_id} recorded at materialization
        self._anchors: dict[str, dict[str, int | None]] = {}
        # name -> {anchor: schema-epoch} (len of the anchor's schema_log)
        # recorded at materialization. Schema evolution (add/rename/drop/
        # widen) is a metadata-only commit that does NOT advance
        # current_snapshot_id, yet it changes what a read returns (a
        # dropped-then-re-added column reads NULL; a rename changes result
        # columns) — without this, is_fresh would keep serving the
        # pre-evolution materialization
        self._epochs: dict[str, dict[str, int]] = {}
        # name -> SQL text, for reflections whose definition IS a SQL string
        # (these survive process restarts via the registry file)
        self._sql_defs: dict[str, str] = {}
        # name -> {"dataset", "dims": [...], "measures": [(col, AGG), ...]}
        # for AGGREGATE reflections whose storage follows the partial-column
        # convention (dims verbatim, <col>_<agg> partials, n_rows) — the
        # shapes subset routing can serve
        self._agg_shapes: dict[str, dict] = {}
        # name -> {"tables": [...], "keys": [...], "dims", "measures"} for
        # AGGREGATE reflections defined over a JOIN subtree (Dremio's
        # headline acceleration: a reflection on a join view serves any
        # query over the same join with subset dims — readme.md:331-355;
        # the workshop's customer_spend example IS a join view,
        # readme.md:307-329)
        self._join_shapes: dict[str, dict] = {}
        # name -> {"dataset", "cols": [...] | None, "view_body": str | None}
        # for RAW reflections (raw rows of a dataset, optionally a column
        # subset — ALTER DATASET ... CREATE REFLECTION ... USING RAW /
        # USING DISPLAY(cols), readme.md:320-326). cols=None means the
        # reflection stores every dataset column (SELECT *)
        self._raw_shapes: dict[str, dict] = {}
        # name -> {"tables", "keys", "colmap": {src_ref: stored_col}} for
        # RAW reflections on a plain projection-over-join VIEW: an
        # explicitly spelled query over the SAME join routes here too
        self._raw_join_shapes: dict[str, dict] = {}
        self._load_registry()

    # ------------------------------------------------------- persistence

    @property
    def _registry_path(self) -> str:
        import os

        return os.path.join(self.lake.root, _REFLECTION_NS, "registry.json")

    def _save_registry(self) -> None:
        """Persist SQL-defined reflections (name, SQL, anchors, recorded
        snapshot ids). Thunk-defined reflections are code and stay
        session-scoped — same split as Dremio (SQL datasets persist; ad-hoc
        acceleration is per-session)."""
        import json
        import os

        entries = {
            name: {
                "sql": sql,
                "anchors": self._defs[name][1],
                "anchor_snapshots": self._anchors.get(name, {}),
                "anchor_epochs": self._epochs.get(name, {}),
                **(
                    {"agg_shape": self._agg_shapes[name]}
                    if name in self._agg_shapes
                    else {}
                ),
                **(
                    {"join_shape": self._join_shapes[name]}
                    if name in self._join_shapes
                    else {}
                ),
                **(
                    {"raw_shape": self._raw_shapes[name]}
                    if name in self._raw_shapes
                    else {}
                ),
                **(
                    {"raw_join_shape": self._raw_join_shapes[name]}
                    if name in self._raw_join_shapes
                    else {}
                ),
            }
            for name, sql in self._sql_defs.items()
        }
        tmp = self._registry_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entries, f, indent=1)
        os.replace(tmp, self._registry_path)

    def _load_registry(self) -> None:
        import json
        import os

        if not os.path.exists(self._registry_path):
            return
        with open(self._registry_path) as f:
            entries = json.load(f)
        for name, e in entries.items():
            sql = e["sql"]
            self._sql_defs[name] = sql
            self._defs[name] = (
                (lambda s=sql: self._run_sql(s)),
                list(e["anchors"]),
            )
            self._anchors[name] = dict(e["anchor_snapshots"])
            # registries written before schema-epoch tracking lack the key:
            # leave the entry epoch-less so is_fresh reports stale once and
            # the refresh records proper epochs
            if "anchor_epochs" in e:
                self._epochs[name] = dict(e["anchor_epochs"])
            if "agg_shape" in e:
                shape = dict(e["agg_shape"])
                shape["measures"] = [tuple(m) for m in shape["measures"]]
                self._agg_shapes[name] = shape
            if "join_shape" in e:
                shape = dict(e["join_shape"])
                shape["measures"] = [tuple(m) for m in shape["measures"]]
                self._join_shapes[name] = shape
            if "raw_shape" in e:
                self._raw_shapes[name] = dict(e["raw_shape"])
            if "raw_join_shape" in e:
                self._raw_join_shapes[name] = dict(e["raw_join_shape"])

    # ----------------------------------------------------------- helpers

    def _run_sql(self, sql: str) -> DataFrame:
        # re-entrancy guard: the prepare hook (ScriptRunner._refresh) itself
        # resolves reflections, whose definitions land back here — the
        # nested call runs against the views the outer prepare has already
        # registered (tables first), without preparing again
        if self.prepare_sql is not None and not getattr(self, "_preparing", False):
            self._preparing = True
            try:
                self.prepare_sql()
            finally:
                self._preparing = False
        return self.lake.spark.sql(sql)

    def _current_snapshot_ids(self, anchor_tables: list[str]) -> dict[str, int | None]:
        out: dict[str, int | None] = {}
        for t in anchor_tables:
            meta = self.lake.table(t)._load_meta()
            out[t] = meta["current_snapshot_id"]
        return out

    def _current_epochs(self, anchor_tables: list[str]) -> dict[str, int]:
        """Schema epoch per anchor: every evolution pushes one schema_log
        entry, so the log length is a monotone evolution counter."""
        return {
            t: len(self.lake.table(t)._load_meta().get("schema_log", []))
            for t in anchor_tables
        }

    def _record_anchor_state(self, name: str, anchor_tables: list[str]) -> None:
        self._anchors[name] = self._current_snapshot_ids(anchor_tables)
        self._epochs[name] = self._current_epochs(anchor_tables)

    def _storage_name(self, name: str) -> str:
        return f"{_REFLECTION_NS}.{name}"

    def _resolve_dataset(self, dataset: str) -> str | None:
        """Full lake-table name ``dataset`` denotes, or None if it is not a
        table (a view, or an ambiguous/unknown leaf reference)."""
        if self.is_view is not None and self.is_view(dataset):
            return None
        if self.lake.table_exists(dataset):
            return dataset
        matches = [
            t for t in self.lake._walk_tables() if t.split(".")[-1] == dataset
        ]
        return matches[0] if len(matches) == 1 else None

    # --------------------------------------------------------------- API

    def create_reflection(
        self,
        name: str,
        definition: Callable[[], DataFrame] | str,
        anchor_tables: list[str],
        partition_by: list[str] | None = None,
    ) -> None:
        """``ALTER DATASET … CREATE REFLECTION name USING RAW``
        (readme.md:322-326). ``definition`` is a zero-arg thunk returning the
        view DataFrame (thunk, not DataFrame, so refresh re-reads anchors at
        their *new* snapshots) or a SQL string — SQL-defined reflections
        persist across sessions in the registry file. RAW vs AGGREGATION
        reflections differ only in what the definition computes."""
        if isinstance(definition, str):
            sql = definition
            self._sql_defs[name] = sql
            definition = lambda: self._run_sql(sql)  # noqa: E731
        else:
            self._sql_defs.pop(name, None)
        self._defs[name] = (definition, anchor_tables)
        self.lake.drop_table(self._storage_name(name))
        self.lake.create_table_as(self._storage_name(name), definition(), partition_by)
        self._record_anchor_state(name, anchor_tables)
        self._save_registry()

    def is_fresh(self, name: str) -> bool:
        if name not in self._anchors:
            return False
        _, anchor_tables = self._defs[name]
        if self._current_snapshot_ids(anchor_tables) != self._anchors[name]:
            return False
        # schema evolution is a metadata-only commit (same snapshot id) but
        # changes read results — any evolution since materialization is
        # staleness; entries without a recorded epoch (pre-upgrade registry
        # files) refresh once to record one
        return self._current_epochs(anchor_tables) == self._epochs.get(name)

    def _storage(self, name: str):
        """Reflection storage handle with the grants check BYPASSED: a
        routed/resolved read serves an internal materialization of data the
        user was already authorized to read on the queried dataset, so
        routing must never make a permitted query fail with a
        PermissionError on the internal ``_reflections`` namespace."""
        t = self.lake.table(self._storage_name(name))
        t._acl = None
        return t

    def resolve(self, name: str) -> DataFrame:
        """Transparent substitution: materialized scan when fresh, live
        recompute when stale (correctness always wins — readme.md:334-344
        'queries are automatically accelerated … always up to date')."""
        definition, _ = self._defs[name]
        if self.is_fresh(name):
            return self._storage(name).read()
        return definition()

    def refresh(self, name: str) -> None:
        """Re-materialize from current anchor snapshots (readme.md:383-389)."""
        definition, anchor_tables = self._defs[name]
        self.lake.table(self._storage_name(name)).overwrite(definition())
        self._record_anchor_state(name, anchor_tables)
        if name in self._sql_defs:
            self._save_registry()

    def refresh_incremental(self, name: str, delta_definition: Callable[[DataFrame], DataFrame]) -> bool:
        """Incremental refresh for single-anchor RAW reflections (row-wise
        definitions — project/filter/enrich): apply ``delta_definition`` to
        only the rows appended since the recorded snapshot and append the
        result (Dremio's incremental reflection refresh, readme.md:383-389;
        built on :meth:`~.lakeshim.LakeTable.read_incremental`).

        Returns True if the incremental path applied; False means history
        had non-append commits (or multi-anchor) — caller falls back to
        ``refresh()``. Cost is O(new data), not O(table)."""
        _, anchor_tables = self._defs[name]
        if len(anchor_tables) != 1:
            return False
        anchor = anchor_tables[0]
        recorded = self._anchors.get(name, {}).get(anchor)
        if recorded is None:
            return False
        t = self.lake.table(anchor)
        try:
            delta = t.read_incremental(recorded)
        except ValueError:
            return False
        self.lake.table(self._storage_name(name)).append(delta_definition(delta))
        self._record_anchor_state(name, anchor_tables)
        if name in self._sql_defs:
            self._save_registry()
        return True

    @staticmethod
    def _partial_aggs(measures) -> tuple[list, list] | None:
        """(delta_aggs, merge_aggs) column expressions for the partial-
        column convention: delta_aggs aggregate RAW rows into partials,
        merge_aggs roll partials up (sum-of-sums / sum-of-counts /
        min-of-mins / max-of-maxs / HLL union). Returns None on a
        non-re-aggregable measure."""
        from pyspark.sql import functions as F

        delta_aggs, merge_aggs = [], []
        for col, agg in measures:
            if col == "*" and agg == "COUNT":
                cname = "n_rows"
                delta_aggs.append(F.count("*").alias(cname))
                merge_aggs.append(F.sum(cname).alias(cname))
            elif agg == "SUM":
                cname = f"{col}_sum"
                delta_aggs.append(F.sum(col).alias(cname))
                merge_aggs.append(F.sum(cname).alias(cname))
            elif agg == "COUNT":
                cname = f"{col}_count"
                delta_aggs.append(F.count(col).alias(cname))
                merge_aggs.append(F.sum(cname).alias(cname))
            elif agg == "MIN":
                cname = f"{col}_min"
                delta_aggs.append(F.min(col).alias(cname))
                merge_aggs.append(F.min(cname).alias(cname))
            elif agg == "MAX":
                cname = f"{col}_max"
                delta_aggs.append(F.max(col).alias(cname))
                merge_aggs.append(F.max(cname).alias(cname))
            elif agg == "NDV":
                # HLL sketches merge losslessly: the merged sketch equals
                # the sketch of the union, so incremental refresh changes
                # nothing about the estimate
                cname = f"{col}_hll"
                delta_aggs.append(F.hll_sketch_agg(col).alias(cname))
                merge_aggs.append(F.hll_union_agg(cname).alias(cname))
            else:  # pragma: no cover - register_*_shape filters these
                return None
        return delta_aggs, merge_aggs

    def _merge_delta_partials(
        self, name: str, delta_grouped: DataFrame, dims: list[str], merge_aggs
    ) -> bool:
        """Union delta partials onto the stored partials and roll up —
        O(new groups + stored groups), never O(table)."""
        storage = self.lake.table(self._storage_name(name))
        try:
            merged = (
                storage.read()
                .unionByName(delta_grouped)
                .groupBy(*dims)
                .agg(*merge_aggs)
            )
        except Exception:
            # storage columns drifted from the partial convention (e.g. a
            # definition with custom casts): correctness wins, full refresh
            return False
        storage.overwrite(merged)
        return True

    def refresh_incremental_agg(self, name: str) -> bool:
        """Incremental refresh for AGGREGATE reflections: aggregate ONLY the
        rows appended since the recorded snapshot into delta partials, then
        merge them into the stored partials with the rollup algebra
        (sum-of-sums / sum-of-counts / min-of-mins / max-of-maxs) — Dremio's
        incremental reflection refresh (readme.md:383-389) for the
        AGGREGATE case. Cost is O(new data + groups), never O(table).

        Applies when the reflection has a registered agg shape
        (:meth:`register_agg_shape` partial-column convention, partials
        computed from the raw anchor columns), a single anchor, and the
        anchor history since the recorded snapshot is append-only — or a
        registered JOIN shape where exactly one join side grew append-only
        (:meth:`_refresh_incremental_join_agg`). Returns False otherwise —
        caller falls back to :meth:`refresh`. AVG is never stored (not
        re-aggregable), so every stored partial merges exactly: the merged
        table is value-identical to a full recompute.
        """
        if name in self._join_shapes:
            return self._refresh_incremental_join_agg(name)
        shape = self._agg_shapes.get(name)
        if name not in self._defs or shape is None:
            return False
        _, anchor_tables = self._defs[name]
        if len(anchor_tables) != 1:
            return False
        anchor = anchor_tables[0]
        # The delta is aggregated from the RAW anchor table, so the shape's
        # dataset must BE the anchor: a shape registered over a view (e.g.
        # CREATE VIEW v AS SELECT * FROM sales WHERE region='east') has the
        # same columns and would pass every later guard while merging
        # UNFILTERED anchor rows into the partials — wrong results. Fall
        # back to refresh(), which recomputes through the real definition.
        if self._resolve_dataset(shape["dataset"]) != anchor:
            return False
        anchors_rec = self._anchors.get(name, {})
        if anchor not in anchors_rec:
            return False
        # recorded None = the reflection was registered on an EMPTY anchor
        # (e.g. a streaming sink's table before its first batch): every row
        # is the delta, same all-append requirement
        recorded = anchors_rec[anchor]
        try:
            delta = self.lake.table(anchor).read_incremental(recorded)
        except ValueError:
            return False

        dims = shape["dims"]
        built = self._partial_aggs(shape["measures"])
        if built is None:
            return False
        delta_aggs, merge_aggs = built
        if not self._merge_delta_partials(
            name, delta.groupBy(*dims).agg(*delta_aggs), dims, merge_aggs
        ):
            return False
        self._record_anchor_state(name, anchor_tables)
        if name in self._sql_defs:
            self._save_registry()
        return True

    def _refresh_incremental_join_agg(self, name: str) -> bool:
        """Incremental refresh for JOIN-shape AGGREGATE reflections: when
        exactly ONE side of the registered inner equi-join grew by
        append-only commits, the new contribution is ``delta ⋈ (other
        sides)`` — inner join distributes over union on either input, so
        aggregating that contribution into delta partials and merging them
        with the rollup algebra is value-identical to a full re-join
        (Dremio's incremental reflection refresh over a join view,
        readme.md:383-389). Typical cost: the appended fact rows join the
        (usually broadcast-size) dim sides — O(delta), never a full fact
        re-join. Dim-side rewrites (UPDATE/DELETE), multiple advanced
        sides, or any non-append history return False: caller falls back
        to :meth:`refresh`."""
        shape = self._join_shapes.get(name)
        if shape is None or name not in self._defs:
            return False
        _, anchor_tables = self._defs[name]
        tables = shape["tables"]
        if set(anchor_tables) != set(tables) or len(set(tables)) != len(tables):
            return False  # (self-joins keep the full-refresh path)
        recorded = self._anchors.get(name, {})
        if any(t not in recorded for t in tables):
            return False
        advanced = [
            t
            for t in tables
            if self.lake.table(t)._load_meta()["current_snapshot_id"]
            != recorded[t]
        ]
        if len(advanced) != 1:
            return False
        moved = advanced[0]
        frames: dict[str, DataFrame] = {}
        try:
            for t in tables:
                lt = self.lake.table(t)
                frames[t] = (
                    lt.read_incremental(recorded[t]) if t == moved else lt.read()
                )
        except ValueError:
            return False  # non-append history on the advanced side
        joined = self._execute_join(frames, shape["keys"])
        if joined is None:
            return False
        dims = shape["dims"]
        built = self._partial_aggs(shape["measures"])
        if built is None:
            return False
        delta_aggs, merge_aggs = built
        try:
            delta_grouped = joined.groupBy(*dims).agg(*delta_aggs)
        except Exception:
            return False  # ambiguous bare name etc. — full refresh decides
        if not self._merge_delta_partials(name, delta_grouped, dims, merge_aggs):
            return False
        self._record_anchor_state(name, anchor_tables)
        if name in self._sql_defs:
            self._save_registry()
        return True

    @staticmethod
    def _execute_join(
        frames: dict[str, DataFrame], keys: list[str]
    ) -> DataFrame | None:
        """Inner-join the per-table frames along canonical ``'t1.c1=t2.c2'``
        key pairs, attaching one new table per step (star/snowflake
        shapes); a key whose tables are both already joined becomes a
        post-filter. Returns None on a disconnected or unparsable tree."""
        pairs = []
        for k in keys:
            a, b = k.split("=")
            ta, _, ca = a.rpartition(".")
            tb, _, cb = b.rpartition(".")
            if not ta or not tb:
                return None
            pairs.append((ta, ca, tb, cb))
        first = pairs[0][0]
        joined = frames.get(first)
        if joined is None:
            return None
        in_join = {first}
        pending = list(pairs)
        while pending:
            for p in pending:
                ta, ca, tb, cb = p
                if ta in in_join and tb in in_join:
                    joined = joined.filter(frames[ta][ca] == frames[tb][cb])
                    pending.remove(p)
                    break
                new = None
                if ta in in_join and tb in frames and tb not in in_join:
                    new = tb
                elif tb in in_join and ta in frames and ta not in in_join:
                    new = ta
                if new is not None:
                    joined = joined.join(
                        frames[new], frames[ta][ca] == frames[tb][cb], "inner"
                    )
                    in_join.add(new)
                    pending.remove(p)
                    break
            else:
                return None  # disconnected join graph
        if in_join != set(frames):
            return None
        return joined

    def register_agg_shape(
        self,
        name: str,
        dataset: str,
        dims: list[str],
        measures: list[tuple[str, str]],
        view_body: str | None = None,
    ) -> None:
        """Record that reflection ``name`` materializes the aggregate shape
        ``SELECT dims, partials FROM dataset GROUP BY dims`` with the
        partial-column convention ``<col>_<agg>`` (+ ``n_rows`` for
        COUNT(*)). Only re-aggregable partials are registered (SUM, COUNT,
        MIN, MAX; an AVG partial cannot be rolled up and is skipped) — this
        is what makes the reflection servable for dim-SUBSET queries, not
        just exact-shape matches. NDV partials are Apache DataSketches HLL
        sketches (``<col>_hll`` binary columns): mergeable like any other
        partial, they make APPROX_COUNT_DISTINCT servable from the
        reflection — the one distinct-count form that CAN ride a rollup."""
        kept = [
            (col, agg.upper())
            for col, agg in measures
            if agg.upper() in ("SUM", "COUNT", "MIN", "MAX", "NDV")
        ]
        self._agg_shapes[name] = {
            "dataset": dataset,
            "dims": list(dims),
            "measures": kept,
            "view_body": view_body,
        }
        if name in self._sql_defs:
            self._save_registry()

    # SQL keywords / literals that may appear inside a WHERE predicate and
    # are NOT column references
    _PRED_KEYWORDS = frozenset(
        "and or not in between like ilike rlike is null true false escape "
        "case when then else end distinct interval date timestamp exists "
        "cast as div mod".split()
    )
    # nondeterministic (or evaluation-time-dependent) functions: filtering
    # the MATERIALIZED PARTIALS with e.g. rand() < 0.5 samples GROUPS, not
    # raw ROWS — systematically different from the plain plan — and
    # current_timestamp() evaluated at routing time diverges from the
    # plain plan's evaluation. Predicates containing any of these are
    # never routed.
    _PRED_NONDETERMINISTIC = frozenset(
        "rand randn random uuid shuffle monotonically_increasing_id "
        "current_timestamp current_date current_timezone now localtimestamp "
        "curdate current_user session_user user input_file_name "
        "spark_partition_id".split()
    )

    @classmethod
    def _predicate_columns(cls, where: str) -> set[str] | None:
        """Column names a predicate references (identifiers outside string
        literals, excluding keywords and function names). Returns None when
        the predicate has a shape we can't attribute (qualified ``a.b``
        refs, subqueries) — callers must then NOT serve from a reflection."""
        cols: set[str] = set()
        i, n = 0, len(where)
        while i < n:
            ch = where[i]
            if ch == "'":
                j = where.find("'", i + 1)
                i = n if j == -1 else j + 1
                continue
            if ch.isalpha() or ch == "_" or ch == "`":
                tick = ch == "`"
                j = i + 1 if tick else i
                k = j
                while k < n and (where[k].isalnum() or where[k] == "_"):
                    k += 1
                ident = where[j:k]
                if tick:
                    if k >= n or where[k] != "`":
                        return None
                    k += 1
                # lookahead past spaces
                m = k
                while m < n and where[m].isspace():
                    m += 1
                if m < n and where[m] == "(":
                    if ident.lower() in cls._PRED_NONDETERMINISTIC:
                        return None  # nondeterministic fn: never route
                    i = k
                    continue  # function name, not a column
                if m < n and where[m] == ".":
                    return None  # qualified ref: can't prove it's a dim
                low = ident.lower()
                if low == "select":
                    return None  # subquery: not servable from partials
                if low not in cls._PRED_KEYWORDS:
                    cols.add(ident)
                i = k
                continue
            i += 1
        return cols

    def route_aggregate(
        self,
        dataset: str,
        dims: list[str],
        measures: list[tuple[str, str, str]],
        where: str | None = None,
    ) -> DataFrame | None:
        """Serve ``SELECT dims, aggs FROM dataset [WHERE pred] GROUP BY
        dims`` from a FRESH aggregate reflection whose dims are a superset
        and whose stored partials cover every requested measure — Dremio's
        covered-query substitution (readme.md:331-355: a reflection
        'accelerates any query it covers', not only its defining query).

        ``where``: optional predicate referencing ONLY the reflection's
        dimension columns — dims are stored raw (one row per fine-grained
        dim group, every raw row in a group shares its dim values), so
        filtering the materialized partials before the rollup is EXACT.
        This is the workshop's own demo shape: ``customer_spend`` queried
        per-city (readme.md:307-329). A predicate touching any non-dim
        column (a measure, an unknown name) falls back to the plain plan.

        ``measures``: (AGG, col, out_alias). Rollup algebra over partials:
        SUM = SUM(col_sum), COUNT(col) = SUM(col_count), COUNT(*) =
        SUM(n_rows), MIN = MIN(col_min), MAX = MAX(col_max), AVG =
        SUM(col_sum)/SUM(col_count). Returns None when no fresh covering
        reflection exists (caller runs the plain plan). The reflection has
        one row per fine-grained dim group, so this re-aggregation scans
        O(groups) rows — the whole point of serving from it."""

        def needed(agg: str, col: str) -> list[tuple[str, str]]:
            if agg == "AVG":
                return [(col, "SUM"), (col, "COUNT")]
            if agg == "COUNT" and col == "*":
                return [("*", "COUNT")]
            if agg == "APPROX_COUNT_DISTINCT":
                return [(col, "NDV")]
            return [(col, agg)]

        pred_cols = None
        if where is not None:
            pred_cols = self._predicate_columns(where)
            if pred_cols is None:
                return None
        req_dims = set(dims)
        want_ds = self._canon_ds(dataset)
        for name, shape in self._agg_shapes.items():
            if name not in self._defs:
                continue
            if self._canon_ds(shape["dataset"]) != want_ds:
                continue
            if self._view_drifted(shape):
                continue  # view redefined since materialization
            if not req_dims <= set(shape["dims"]):
                continue
            if pred_cols is not None and not pred_cols <= set(shape["dims"]):
                continue  # predicate touches a non-dim column: not exact
            if not self._covers(shape, measures, needed):
                continue
            if not self.is_fresh(name):
                continue  # stale: correctness wins, plain plan runs
            return self._serve_rollup(name, dims, measures, where)
        return None

    @staticmethod
    def _covers(shape: dict, measures, needed) -> bool:
        stored = set(shape["measures"])
        return all(
            pair in stored for agg, col, _ in measures for pair in needed(agg, col)
        )

    def _serve_rollup(
        self, name: str, dims: list[str], measures, where: str | None = None
    ) -> DataFrame | None:
        """Re-aggregate a reflection's stored partials to the requested
        (coarser) dims with the rollup algebra. O(groups) rows scanned.
        ``where`` (dims-only, validated by the caller) rides the storage
        read so file-level data skipping prunes the reflection's files
        too."""
        from pyspark.sql import functions as F

        base = self._storage(name).read(where=where)
        aggs = []
        for agg, col, alias in measures:
            if agg == "SUM":
                e = F.sum(f"{col}_sum")
            elif agg == "MIN":
                e = F.min(f"{col}_min")
            elif agg == "MAX":
                e = F.max(f"{col}_max")
            elif agg == "COUNT":
                e = F.sum("n_rows") if col == "*" else F.sum(f"{col}_count")
            elif agg == "AVG":
                e = F.sum(f"{col}_sum") / F.sum(f"{col}_count")
            elif agg == "APPROX_COUNT_DISTINCT":
                # union the per-group sketches, then estimate — the
                # rollup is exact over the sketch state (both the
                # reflection and this finalize are DataSketches HLL;
                # an inline approx_count_distinct uses HLL++ and may
                # estimate slightly differently — both approximate the
                # same NDV, which is the approx-measure contract)
                e = F.hll_sketch_estimate(F.hll_union_agg(f"{col}_hll"))
            else:  # pragma: no cover - filtered by `needed`
                return None
            aggs.append(e.alias(alias))
        return base.groupBy(*dims).agg(*aggs)

    # ------------------------------------------------- dataset identity

    def _canon_ds(self, dataset: str) -> str:
        """Canonical name for a dataset reference: the host surface's
        resolution (leaf view names -> full view names) when hooked, else
        lake-table resolution, else the spelling itself. Lets a query
        written ``FROM gold_view`` match a shape registered on
        ``db.gold_view`` (the workshop declares reflections on VIEWS and
        queries them by either spelling, readme.md:307-329)."""
        if self.canonical_dataset is not None:
            try:
                c = self.canonical_dataset(dataset)
            except Exception:
                c = None
            if c:
                return c
        return self._resolve_dataset(dataset) or dataset

    def _view_drifted(self, shape: dict) -> bool:
        """True when the shape was registered over a VIEW whose body has
        since been redefined: is_fresh only watches anchor snapshots, so
        the materialization may hold the OLD definition's rows while the
        anchors never moved — routing must refuse (plain plan wins)."""
        recorded = shape.get("view_body")
        if recorded is None or self.view_body is None:
            return False
        ds = shape.get("dataset")
        if ds is None:
            return True  # body recorded but no view name to verify against
        try:
            current = self.view_body(ds)
        except Exception:
            return True
        norm = lambda s: re.sub(r"\s+", " ", s).strip().rstrip(";").lower()  # noqa: E731
        return current is None or norm(current) != norm(recorded)

    # --------------------------------------------------- RAW reflections

    def register_raw_shape(
        self,
        name: str,
        dataset: str,
        cols: list[str] | None = None,
        view_body: str | None = None,
    ) -> None:
        """Record that reflection ``name`` stores the RAW ROWS of
        ``dataset`` — ``ALTER DATASET … CREATE REFLECTION … USING RAW``
        (readme.md:320-326) / ``USING DISPLAY(cols)`` (a column subset).
        Unlike an aggregate shape there is no partial-column convention:
        storage is one row per dataset row, so any projection / filter /
        ORDER / LIMIT over the stored columns is exactly servable
        (readme.md:331-355 'accelerates any query it covers' — the
        workshop's headline example IS a RAW reflection). ``view_body``:
        the defining SQL when ``dataset`` is a logical view, checked for
        drift at route time."""
        self._raw_shapes[name] = {
            "dataset": dataset,
            "cols": list(cols) if cols is not None else None,
            "view_body": view_body,
        }
        if name in self._sql_defs:
            self._save_registry()

    def route_raw(
        self,
        dataset: str,
        cols: list[str] | None,
        where: str | None = None,
        order: list[tuple[str, bool]] | None = None,
        limit: int | None = None,
    ) -> DataFrame | None:
        """Serve ``SELECT cols FROM dataset [WHERE pred] [ORDER BY …]
        [LIMIT n]`` from a FRESH RAW reflection covering the referenced
        columns — the non-aggregate half of Dremio's covered-query
        substitution (readme.md:331-355; the workshop's
        ``customer_spend_reflection USING RAW``, readme.md:320-326).

        ``cols=None`` means ``SELECT *`` — served only by a full
        (``cols=None``) RAW reflection, since a DISPLAY-subset one cannot
        prove it stores every dataset column. ``where`` may reference ANY
        stored column (raw rows: filtering is exact, no dim/measure
        split); it rides the storage read so file-level data skipping
        prunes the reflection's files. ``order`` is [(col, desc)] over
        stored columns. Returns None when no fresh covering reflection
        exists — the caller runs the plain plan. At 100 TB this replaces
        a wide fact scan with a scan of the (narrow, pre-projected,
        pruned) reflection storage."""
        pred_cols = None
        if where is not None:
            pred_cols = self._predicate_columns(where)
            if pred_cols is None:
                return None
        want_ds = self._canon_ds(dataset)
        for name, shape in self._raw_shapes.items():
            if name not in self._defs:
                continue
            if self._canon_ds(shape["dataset"]) != want_ds:
                continue
            if self._view_drifted(shape):
                continue
            stored = shape.get("cols")
            if cols is None and stored is not None:
                continue  # SELECT *: only a full RAW reflection covers it
            if not self.is_fresh(name):
                continue  # stale: correctness wins, plain plan runs
            storage = self._storage(name)
            stored_set = (
                set(stored) if stored is not None else set(storage.read().columns)
            )
            if cols is not None and not set(cols) <= stored_set:
                continue
            if pred_cols is not None and not pred_cols <= stored_set:
                continue
            if order is not None and not {c for c, _ in order} <= stored_set:
                continue
            df = storage.read(where=where)
            # SELECT *: keep the dataset's column order (= storage's)
            out_cols = list(cols) if cols is not None else df.columns
            if order:
                df = df.orderBy(
                    *[
                        F.col(c).desc() if desc else F.col(c).asc()
                        for c, desc in order
                    ]
                )
            out = df.select(*out_cols)
            if limit is not None:
                out = out.limit(limit)
            return out
        return None

    # --------------------------------------- RAW join-subtree reflections

    def register_raw_join_shape(
        self,
        name: str,
        tables: list[str],
        join_keys: list[str],
        colmap: dict[str, str],
        view_body: str | None = None,
        dataset: str | None = None,
        aggs: list[list[str]] | None = None,
    ) -> None:
        """Record that RAW reflection ``name`` stores the rows of a plain
        PROJECTION over an inner equi-join view — so a query spelling the
        SAME join explicitly (``SELECT cols FROM a JOIN b ON … WHERE …``)
        routes to the materialization too: the last spelling of Dremio's
        'accelerates any query it covers' (readme.md:331-355) the engine
        serves. ``colmap`` maps source refs ``'tbl.col'`` to the stored
        output column name; identity uses the same canonical join-subtree
        form as :meth:`register_join_agg_shape`.

        ``aggs`` marks the view as an AGGREGATE over the join (the
        workshop's ``customer_spend``): [[AGG, src_ref|'*', stored_name],
        …] with ``colmap`` then holding the GROUP BY dims. Such a shape
        serves the explicitly spelled aggregate (exact-dims match) via
        :meth:`route_raw_agg_join`, never a plain scan."""
        t, k = self._canonical_join(tables, join_keys)

        def canon_src(src: str) -> str:
            tbl, _, col = src.rpartition(".")
            return f"{self._resolve_dataset(tbl) or tbl}.{col}"

        canon_map = {canon_src(s): out for s, out in colmap.items()}
        self._raw_join_shapes[name] = {
            "tables": list(t),
            "keys": list(k),
            "colmap": canon_map,
            "view_body": view_body,
            "dataset": dataset,
            "aggs": [
                [a.upper(), s if s == "*" else canon_src(s), out]
                for a, s, out in (aggs or [])
            ]
            or None,
        }
        if name in self._sql_defs:
            self._save_registry()

    def _rewrite_pred_to_stored(self, where: str, canon_ref) -> str | None:
        """Rewrite every column reference in ``where`` (qualified
        ``alias.col`` / ``tbl.col`` or bare) to its stored reflection
        column via ``canon_ref``; None when any reference cannot be proven
        covered (unknown qualifier, ambiguous bare name, subquery,
        nondeterministic function) — the caller then falls back to the
        plain plan. Single-quoted literals pass through untouched."""
        out: list[str] = []
        i, n = 0, len(where)
        while i < n:
            ch = where[i]
            if ch == "'":
                j = where.find("'", i + 1)
                j = n - 1 if j == -1 else j
                out.append(where[i : j + 1])
                i = j + 1
                continue
            if ch.isalpha() or ch == "_":
                k = i
                while k < n and (where[k].isalnum() or where[k] == "_"):
                    k += 1
                ident = where[i:k]
                m = k
                while m < n and where[m].isspace():
                    m += 1
                if m < n and where[m] == "(":
                    if ident.lower() in self._PRED_NONDETERMINISTIC:
                        return None
                    out.append(where[i:k])
                    i = k
                    continue
                if k < n and where[k] == ".":
                    j = k + 1
                    k2 = j
                    while k2 < n and (where[k2].isalnum() or where[k2] in "._"):
                        k2 += 1
                    ref = where[i:k2]
                    stored = canon_ref(ref)
                    if stored is None:
                        return None
                    out.append(stored)
                    i = k2
                    continue
                low = ident.lower()
                if low == "select":
                    return None
                if low in self._PRED_KEYWORDS:
                    out.append(ident)
                    i = k
                    continue
                stored = canon_ref(ident)
                if stored is None:
                    return None
                out.append(stored)
                i = k
                continue
            out.append(ch)
            i += 1
        return "".join(out)

    def route_raw_join(
        self,
        tables: list[str],
        join_keys: list[str],
        select: list[tuple[str, str]],
        where: str | None = None,
        aliases: dict[str, str] | None = None,
        order: list[tuple[str, bool]] | None = None,
        limit: int | None = None,
    ) -> DataFrame | None:
        """Serve an explicitly spelled ``SELECT cols FROM a JOIN b ON …
        [WHERE] [ORDER BY] [LIMIT]`` from a FRESH RAW reflection registered
        on the equivalent join VIEW. ``select`` is [(source_ref,
        output_name)]; ``aliases`` is the query's alias→table map. Column
        references resolve through the shape's colmap (alias- and
        key-order-invariant via the canonical join identity); anything
        unresolvable falls back to the plain plan. At 100 TB this replaces
        the query's join shuffle with a pruned scan of the pre-joined
        reflection storage."""
        want = self._canonical_join(tables, join_keys)
        aliases = aliases or {}

        for name, shape in self._raw_join_shapes.items():
            if name not in self._defs:
                continue
            if shape.get("aggs"):
                continue  # aggregate view: stored rows are groups, not raw rows
            if (tuple(shape["tables"]), tuple(shape["keys"])) != want:
                continue
            if self._view_drifted(shape):
                continue
            if not self.is_fresh(name):
                continue
            colmap = shape["colmap"]

            def canon_ref(ref: str, colmap=colmap) -> str | None:
                tbl, _, col = ref.rpartition(".")
                if tbl:
                    tbl = aliases.get(tbl, tbl)
                    return colmap.get(
                        f"{self._resolve_dataset(tbl) or tbl}.{col}"
                    )
                # bare ref: covered only when exactly ONE source column
                # spells it (a join makes bare names ambiguous otherwise)
                hits = [
                    v for s, v in colmap.items()
                    if s.rpartition(".")[2] == ref
                ]
                return hits[0] if len(hits) == 1 else None

            sel_stored = []
            ok = True
            for ref, out_name in select:
                st = canon_ref(ref)
                if st is None:
                    ok = False
                    break
                sel_stored.append((st, out_name))
            if not ok:
                continue
            w = None
            if where is not None:
                w = self._rewrite_pred_to_stored(where, canon_ref)
                if w is None:
                    continue
            df = self._storage(name).read(where=w)
            if order is not None:
                ord_exprs = []
                out_to_stored = {o: s for s, o in sel_stored}
                for ref, desc in order:
                    st = canon_ref(ref) or out_to_stored.get(ref)
                    if st is None:
                        ok = False
                        break
                    ord_exprs.append(
                        F.col(st).desc() if desc else F.col(st).asc()
                    )
                if not ok:
                    continue
                df = df.orderBy(*ord_exprs)
            routed = df.select(
                *[F.col(st).alias(o) for st, o in sel_stored]
            )
            if limit is not None:
                routed = routed.limit(limit)
            return routed
        return None

    @staticmethod
    def _bare_hit_static(colmap: dict[str, str], ref: str) -> str | None:
        hits = [v for s, v in colmap.items() if s.rpartition(".")[2] == ref]
        return hits[0] if len(hits) == 1 else None

    def route_raw_agg_join(
        self,
        tables: list[str],
        join_keys: list[str],
        dims: list[tuple[str, str]],
        measures: list[tuple[str, str, str]],
        where: str | None = None,
        aliases: dict[str, str] | None = None,
        order: list[tuple[str, bool]] | None = None,
        limit: int | None = None,
    ) -> DataFrame | None:
        """Serve an explicitly spelled ``SELECT dims, AGG(col) AS out FROM
        a JOIN b ON … [WHERE dims-pred] GROUP BY dims`` from a FRESH RAW
        reflection on the equivalent AGGREGATE join view — the workshop's
        ``customer_spend_reflection USING RAW`` answering the view's own
        query written against the base tables (readme.md:307-355).
        Exact-dims matching only: the stored rows ARE the groups, so the
        query's GROUP BY set must equal the view's (no rollup algebra —
        that is the AGGREGATE reflection's job); each measure must appear
        verbatim (same AGG over the same source column). ``dims`` is
        [(src_ref, out_name)], ``measures`` [(AGG, src_ref|'*',
        out_name)]. WHERE may reference dims only (groups filter
        exactly)."""
        want = self._canonical_join(tables, join_keys)
        aliases = aliases or {}

        def canon(ref: str) -> str:
            tbl, _, col = ref.rpartition(".")
            if not tbl:
                return ref
            tbl = aliases.get(tbl, tbl)
            return f"{self._resolve_dataset(tbl) or tbl}.{col}"

        for name, shape in self._raw_join_shapes.items():
            if name not in self._defs or not shape.get("aggs"):
                continue
            if (tuple(shape["tables"]), tuple(shape["keys"])) != want:
                continue
            if self._view_drifted(shape):
                continue
            if not self.is_fresh(name):
                continue
            colmap = shape["colmap"]
            agg_map = {(a, s): out for a, s, out in shape["aggs"]}

            def dim_src(ref: str, colmap=colmap) -> str | None:
                if "." in ref:
                    src = canon(ref)
                    return src if src in colmap else None
                hits = [s for s in colmap if s.rpartition(".")[2] == ref]
                return hits[0] if len(hits) == 1 else None

            q_dims: dict[str, str] = {}
            ok = True
            for r, out in dims:
                src = dim_src(r)
                if src is None:
                    ok = False
                    break
                q_dims[src] = out
            if not ok or set(q_dims) != set(colmap):
                continue  # stored groups only prove the EXACT dims set
            sel: list[tuple[str, str]] = [
                (colmap[src], out) for src, out in q_dims.items()
            ]
            for agg, ref, out in measures:
                if ref == "*":
                    src = "*"
                elif "." in ref:
                    src = canon(ref)
                else:
                    hits = {
                        s for a, s in agg_map
                        if a == agg.upper() and s != "*"
                        and s.rpartition(".")[2] == ref
                    }
                    src = hits.pop() if len(hits) == 1 else None
                stored = agg_map.get((agg.upper(), src)) if src else None
                if stored is None:
                    ok = False
                    break
                sel.append((stored, out))
            if not ok:
                continue
            w = None
            if where is not None:
                w = self._rewrite_pred_to_stored(
                    where,
                    lambda ref: colmap.get(canon(ref))
                    if "." in ref
                    else self._bare_hit_static(colmap, ref),
                )
                if w is None:
                    continue
            if not self.is_fresh(name):
                continue
            df = self._storage(name).read(where=w)
            if order is not None:
                out_to_stored = {o: s for s, o in sel}
                ord_exprs = []
                for ref, desc in order:
                    st = out_to_stored.get(ref) or (
                        colmap.get(canon(ref)) if "." in ref
                        else self._bare_hit_static(colmap, ref)
                    )
                    if st is None:
                        ok = False
                        break
                    ord_exprs.append(
                        F.col(st).desc() if desc else F.col(st).asc()
                    )
                if not ok:
                    continue
                df = df.orderBy(*ord_exprs)
            routed = df.select(*[F.col(s).alias(o) for s, o in sel])
            if limit is not None:
                routed = routed.limit(limit)
            return routed
        return None

    # -------------------------------------------- join-subtree reflections

    def _canonical_join(
        self, tables: list[str], join_keys: list[str]
    ) -> tuple[tuple[str, ...], tuple[str, ...]]:
        """Order-independent identity of a join subtree: table names
        resolved to full lake names where possible, sorted; equi-key pairs
        normalized as 'a.col=b.col' with each pair lexicographically
        ordered. Two spellings of the same star join compare equal."""
        resolved = sorted(self._resolve_dataset(t) or t for t in tables)
        keys = []
        for k in join_keys:
            a, _, b = k.partition("=")

            def side(x: str) -> str:
                tbl, _, col = x.strip().rpartition(".")
                return f"{self._resolve_dataset(tbl) or tbl}.{col}"

            keys.append("=".join(sorted((side(a), side(b)))))
        return tuple(resolved), tuple(sorted(keys))

    def register_join_agg_shape(
        self,
        name: str,
        tables: list[str],
        join_keys: list[str],
        dims: list[str],
        measures: list[tuple[str, str]],
        view_body: str | None = None,
        dataset: str | None = None,
    ) -> None:
        """Record that reflection ``name`` materializes ``SELECT dims,
        partials FROM <inner equi-join over tables on join_keys> GROUP BY
        dims`` — Dremio's join-reflection acceleration (readme.md:331-355;
        the workshop's ``customer_spend`` join view, readme.md:307-329).
        ``join_keys`` entries are ``'tbl1.col1=tbl2.col2'``. Dims and
        measure columns are bare output-column names (star-schema queries
        keep them unambiguous). Storage follows the same partial-column
        convention as :meth:`register_agg_shape`."""
        kept = [
            (col, agg.upper())
            for col, agg in measures
            if agg.upper() in ("SUM", "COUNT", "MIN", "MAX", "NDV")
        ]
        t, k = self._canonical_join(tables, join_keys)
        self._join_shapes[name] = {
            "tables": list(t),
            "keys": list(k),
            "dims": list(dims),
            "measures": kept,
            # when the join subtree was parsed out of a VIEW body, record
            # the view + its body so drift invalidates this shape too
            "view_body": view_body,
            "dataset": dataset,
        }
        if name in self._sql_defs:
            self._save_registry()

    def route_join_aggregate(
        self,
        tables: list[str],
        join_keys: list[str],
        dims: list[str],
        measures: list[tuple[str, str, str]],
        where: str | None = None,
    ) -> DataFrame | None:
        """Serve ``SELECT dims, aggs FROM <same inner equi-join> [WHERE
        pred] GROUP BY dims`` from a FRESH join reflection whose join
        subtree is identical (canonicalized) and whose dims are a superset
        — the join half of Dremio's covered-query substitution. ``where``
        must reference only the reflection's (bare-named) dimension
        columns; dims are stored raw so filtering the partials is exact
        (same argument as :meth:`route_aggregate`). The join itself was
        paid ONCE at materialization; serving is an O(groups) scan +
        rollup, which at 100 TB replaces the query's largest shuffle."""

        def needed(agg: str, col: str) -> list[tuple[str, str]]:
            if agg == "AVG":
                return [(col, "SUM"), (col, "COUNT")]
            if agg == "COUNT" and col == "*":
                return [("*", "COUNT")]
            if agg == "APPROX_COUNT_DISTINCT":
                return [(col, "NDV")]
            return [(col, agg)]

        pred_cols = None
        if where is not None:
            pred_cols = self._predicate_columns(where)
            if pred_cols is None:
                return None
        want = self._canonical_join(tables, join_keys)
        req_dims = set(dims)
        for name, shape in self._join_shapes.items():
            if name not in self._defs:
                continue
            if (tuple(shape["tables"]), tuple(shape["keys"])) != want:
                continue
            if self._view_drifted(shape):
                continue
            if not req_dims <= set(shape["dims"]):
                continue
            if pred_cols is not None and not pred_cols <= set(shape["dims"]):
                continue
            if not self._covers(shape, measures, needed):
                continue
            if not self.is_fresh(name):
                continue
            return self._serve_rollup(name, dims, measures, where)
        return None

    def drop_reflection(self, name: str) -> None:
        """Reflection retirement (readme.md:381-389 autonomous retire)."""
        self._defs.pop(name, None)
        self._anchors.pop(name, None)
        self._epochs.pop(name, None)
        self._agg_shapes.pop(name, None)
        self._join_shapes.pop(name, None)
        self._raw_shapes.pop(name, None)
        self._raw_join_shapes.pop(name, None)
        was_sql = self._sql_defs.pop(name, None) is not None
        self.lake.drop_table(self._storage_name(name))
        if was_sql:
            self._save_registry()

    def status(self) -> list[dict]:
        return [
            {
                "name": name,
                "anchors": anchor_tables,
                "fresh": self.is_fresh(name),
                "storage": self._storage_name(name),
            }
            for name, (_, anchor_tables) in self._defs.items()
        ]

    # ------------------------------------------------------ result cache

    def cached_sql(self, sql: str, anchor_tables: list[str]) -> DataFrame:
        """R10 result cache: ``hash(SQL, anchor snapshot ids)`` → materialized
        result table (readme.md:405-411 'result cache'; SURVEY §4 R10).

        Falls out of the reflection machinery: the cache entry is a
        reflection whose name is the SQL digest — fresh while every anchor
        table is at the snapshot recorded at materialization, recomputed (and
        re-cached) the first time it is requested after any anchor advances.
        The reference's probe discipline (dremio.sql:10-13 picks *different*
        columns to bypass the result cache) maps directly: different SQL →
        different digest → miss.
        """
        import hashlib

        digest = hashlib.md5(sql.encode()).hexdigest()[:16]
        name = f"rc_{digest}"
        if name not in self._defs:
            # SQL-defined => persisted; cache hits survive process restarts
            self.create_reflection(name, sql, anchor_tables)
        elif not self.is_fresh(name):
            self.refresh(name)
        return self.resolve(name)
