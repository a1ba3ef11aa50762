"""DataStream — the reference's core abstraction, Spark-first.

Reference: eel-core/src/main/scala/io/eels/datastream/DataStream.scala.
The reference implements every operator as a delegating pub/sub subscriber
over in-process row chunks; here every operator is a *declarative* PySpark
DataFrame transformation, so Catalyst gets predicate pushdown, column
pruning, broadcast selection and AQE for free, and the same code scales
from local[32] to a 1000-executor cluster.

Order-sensitive reference ops (``take``/``drop``/``takeWhile``/``dropWhile``/
``concat``/``zip``) have no implicit row order in a distributed setting, so
they take explicit order columns (SURVEY.md §3).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eel_spark import schema as eel_schema

ColumnLike = Column | str


def _col(c: ColumnLike) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _cond(c: Column | str) -> Column:
    """Accept either a Column predicate or a SQL boolean expression string."""
    return c if isinstance(c, Column) else F.expr(c)


def _order_key(order_by: Sequence[ColumnLike]) -> Column:
    """Build the lexicographic order-key struct for the key-threshold /
    prefix-bound plans, rejecting SortOrder expressions up front.

    ``F.col("k").desc()`` / ``F.asc(...)`` are SORT DIRECTIVES, not
    values — wrapped in a struct they fail only at action time with an
    opaque codegen INTERNAL_ERROR. These plans compare the struct with
    ``<``/``>``, which is ascending by construction; express a
    descending order by transforming the key instead (negate a numeric,
    invert a timestamp) so the comparison direction stays uniform."""
    for c in order_by:
        if isinstance(c, Column):
            node = getattr(c, "_jc", None)
            is_sort = False
            try:
                is_sort = node.node().getClass().getSimpleName() == "SortOrder"
            except Exception:
                is_sort = repr(c).endswith(("NULLS LAST'>", "NULLS FIRST'>"))
            if is_sort:
                raise ValueError(
                    f"order_by entry {c!r} is a SortOrder (desc()/asc()); "
                    "take/drop/take_while/drop_while order keys are "
                    "compared ascending as struct VALUES - pass plain "
                    "columns, and express 'descending' by inverting the "
                    "key itself (e.g. -col for numerics)"
                )
    return F.struct(*[_col(c) for c in order_by])


class DataStream:
    """Fluent, lazy, Catalyst-backed table of rows.

    Mirrors io.eels.datastream.DataStream (DataStream.scala:33) but is a
    zero-copy wrapper around a PySpark DataFrame: no operator here ever
    materializes data on the driver (unlike the reference's ``join``/
    ``cartesian``/``substract`` which ``collect`` the other side —
    DataStream.scala:438,270,739).
    """

    def __init__(self, df: DataFrame, _pinned: list | None = None):
        self.df = df
        # DataFrames persisted on this stream's behalf by operators that
        # need a stable intermediate (zip_with_index, concat): tracked so
        # unpersist() can release executor storage once the consuming
        # action has run — a persist with no release handle leaks storage
        # for the session lifetime
        self._pinned: list = list(_pinned or [])

    # -- schema ------------------------------------------------------------
    @property
    def schema(self) -> T.StructType:
        return self.df.schema

    @property
    def field_names(self) -> list[str]:
        return list(self.df.columns)

    def print_schema(self) -> None:
        self.df.printSchema()

    def _wrap(self, df: DataFrame) -> "DataStream":
        # propagate pinned intermediates down the chain so the terminal
        # stream's unpersist() releases every cache built on its behalf
        return DataStream(df, _pinned=self._pinned)

    # -- row-wise transforms ----------------------------------------------
    def map_field(self, name: str, fn: ColumnLike | Callable[[Column], Column]) -> "DataStream":
        """mapField (DataStream.scala:49) — rewrite one column.

        ``fn`` may be a Column expression, a SQL string, or a callable
        ``Column -> Column`` (the declarative analogue of eel's
        ``Any => Any``).
        """
        expr = fn(F.col(name)) if callable(fn) and not isinstance(fn, Column) else _cond(fn)
        return self._wrap(self.df.withColumn(name, expr))

    def map_field_if_exists(self, name: str, fn) -> "DataStream":
        """mapFieldIfExists (DataStream.scala:58)."""
        if name not in self.df.columns:
            return self
        return self.map_field(name, fn)

    def map_rows(
        self, fn: Callable, schema: T.StructType | str | None = None
    ) -> "DataStream":
        """Escape hatch for eel's arbitrary ``map(Row => Row)``
        (DataStream.scala:40): Arrow-batched ``mapInPandas`` (never
        row-at-a-time Python). Prefer ``map_field``/``add_field`` —
        those stay JVM-side.
        """
        return self._wrap(self.df.mapInPandas(fn, schema or self.df.schema))

    def foreach(self, fn: Callable[[Any], None]) -> "DataStream":
        """foreach (DataStream.scala:371) — side effect per row (action)."""
        self.df.foreach(fn)
        return self

    # -- filtering ---------------------------------------------------------
    def filter(self, predicate: Column | str) -> "DataStream":
        """filter (DataStream.scala:67,79,93) — Column or SQL string;
        pushed down to the scan by Catalyst."""
        return self._wrap(self.df.filter(_cond(predicate)))

    where = filter

    def filter_not(self, predicate: Column | str) -> "DataStream":
        """filterNot (DataStream.scala:108)."""
        return self._wrap(self.df.filter(~_cond(predicate)))

    def filter_field(self, name: str, value: Any) -> "DataStream":
        """field-equality filter (DataStream.scala:79 specialization)."""
        return self._wrap(self.df.filter(F.col(name) == F.lit(value)))

    def drop_null_rows(self) -> "DataStream":
        """dropNullRows (DataStream.scala:462)."""
        return self._wrap(self.df.na.drop("any"))

    def replace_null_values(self, default: Any, subset: list[str] | None = None) -> "DataStream":
        """replaceNullValues (DataStream.scala:755)."""
        return self._wrap(self.df.na.fill(default, subset=subset))

    def sample(self, k: int, on: ColumnLike) -> "DataStream":
        """sample(k) (DataStream.scala:665) — keep all but every k-th row.

        The reference uses a racy shared counter; distributed-safe version
        keys off a deterministic hash of ``on`` so the same rows are kept on
        every execution and on every cluster size.
        """
        return self._wrap(self.df.filter(F.pmod(F.xxhash64(_col(on)), F.lit(k)) != 0))

    # -- projections / schema surgery -------------------------------------
    def projection(self, *fields: str) -> "DataStream":
        """projection (DataStream.scala:705-733) — column pruning reaches
        the parquet scan (ReadSchema)."""
        flat: list[str] = []
        for f in fields:
            # Split "a, b, c" convenience strings — but never inside a
            # function call like "substr(name, 1, 3) as x".
            if isinstance(f, str) and "," in f and "(" not in f:
                flat.extend(p.strip() for p in f.split(","))
            else:
                flat.append(f)
        return self._wrap(self.df.selectExpr(*flat))

    def add_field(
        self, name: str, value: Any = None, expr: ColumnLike | None = None,
        error_if_exists: bool = True,
    ) -> "DataStream":
        """addField family (DataStream.scala:774-854): constant default or
        expression-computed."""
        if name in self.df.columns:
            if error_if_exists:
                raise ValueError(f"Field {name} already exists")
            return self
        column = _cond(expr) if expr is not None else F.lit(value)
        return self._wrap(self.df.withColumn(name, column))

    def add_field_if_not_exists(
        self, name: str, value: Any = None, expr: ColumnLike | None = None
    ) -> "DataStream":
        """addFieldIfNotExists (DataStream.scala:774) — no-op when the
        column is already present."""
        return self.add_field(name, value=value, expr=expr, error_if_exists=False)

    def projection_expression(self, expression: str) -> "DataStream":
        """projectionExpression (DataStream.scala:705) — comma-separated
        projection string, e.g. ``"location,name"``."""
        return self.projection(expression)

    def rename_field(self, name_from: str, name_to: str) -> "DataStream":
        """renameField (DataStream.scala:450)."""
        return self._wrap(self.df.withColumnRenamed(name_from, name_to))

    def remove_field(self, name: str, case_sensitive: bool = True) -> "DataStream":
        """dropField/removeField (DataStream.scala:464-479)."""
        if case_sensitive:
            targets = [c for c in self.df.columns if c == name]
        else:
            targets = [c for c in self.df.columns if c.lower() == name.lower()]
        if not targets:
            raise ValueError(f"Unknown field {name}")
        return self._wrap(self.df.drop(*targets))

    drop_field = remove_field

    def remove_field_if_exists(self, name: str, case_sensitive: bool = True) -> "DataStream":
        """removeFieldIfExists (DataStream.scala:494-513)."""
        try:
            return self.remove_field(name, case_sensitive)
        except ValueError:
            return self

    def remove_fields(self, pattern: str | re.Pattern) -> "DataStream":
        """removeFields(regex) (DataStream.scala:481-492)."""
        rx = re.compile(pattern) if isinstance(pattern, str) else pattern
        keep = [c for c in self.df.columns if not rx.fullmatch(c)]
        return self._wrap(self.df.select(*keep))

    drop_fields = remove_fields

    def replace_field(self, name: str, new_name: str, expr: ColumnLike) -> "DataStream":
        """replaceField (DataStream.scala:356) — swap a field definition."""
        return self._wrap(self.df.withColumn(name, _cond(expr)).withColumnRenamed(name, new_name))

    def replace_field_type(
        self, target: str | T.DataType | re.Pattern, datatype: str | T.DataType
    ) -> "DataStream":
        """replaceFieldType by field name, by current datatype, or by name
        regex (DataStream.scala:344, 868, 872)."""
        dt = eel_schema.eel_type(datatype) if isinstance(datatype, str) else datatype
        if isinstance(target, str):
            hit = lambda f: f.name == target
        elif isinstance(target, T.DataType):
            hit = lambda f: f.dataType == target
        else:
            hit = lambda f: bool(target.fullmatch(f.name))
        # one projection for all sweeps (withColumn-per-field stacks
        # Project nodes — quadratic analyzer cost on wide schemas)
        cols = [
            (F.col(f.name).cast(dt) if hit(f) else F.col(f.name)).alias(f.name)
            for f in self.df.schema.fields
        ]
        return self._wrap(self.df.select(*cols))

    def align(self, schema: T.StructType, pad_missing: bool = False) -> "DataStream":
        """align (DataStream.scala:122) — reorder to the target schema, drop
        extraneous fields, cast to target types; missing fields error
        (strict default) or pad as typed NULLs (``pad_missing=True``, the
        evolution-write path)."""
        missing = [f.name for f in schema.fields if f.name not in self.df.columns]
        if missing and not pad_missing:
            raise ValueError(f"Cannot align: missing fields {missing}")
        cols = [
            (F.lit(None) if f.name in missing else F.col(f.name))
            .cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
        return self._wrap(self.df.select(*cols))

    def to_lowercase_schema(self) -> "DataStream":
        """withLowerCaseSchema (DataStream.scala:95)."""
        return self._wrap(self.df.toDF(*[c.lower() for c in self.df.columns]))

    def strip_chars_from_field_names(self, chars: Sequence[str]) -> "DataStream":
        """stripCharsFromFieldNames (DataStream.scala:590)."""
        bad = set(chars)
        renamed = ["".join(ch for ch in c if ch not in bad) for c in self.df.columns]
        return self._wrap(self.df.toDF(*renamed))

    # -- value replacement (update/replace family, DataStream.scala:605-657)
    def replace_value(self, name: str, from_value: Any, target: Any) -> "DataStream":
        """replace(fieldName, from, target) (DataStream.scala:644)."""
        c = F.col(name)
        return self._wrap(
            self.df.withColumn(name, F.when(c == F.lit(from_value), F.lit(target)).otherwise(c))
        )

    def replace_value_all(self, from_value: Any, target: Any) -> "DataStream":
        """replace(from, target) across all fields (DataStream.scala:652).

        ``try_cast`` (not ``cast``): under ANSI mode an incompatible
        literal→column cast is a *runtime* error; try_cast folds to NULL so
        incompatible columns are left untouched, matching the reference's
        equality-only semantics.
        """
        # ONE select over all columns, not a withColumn per column: each
        # withColumn stacks a Project node, and analyzer cost on a
        # wide schema goes quadratic (the classic PySpark anti-pattern)
        def swap(f):
            lit = F.lit(from_value).try_cast(f.dataType)
            c = F.col(f.name)
            return F.when(
                lit.isNotNull() & (c == lit), F.lit(target).try_cast(f.dataType)
            ).otherwise(c).alias(f.name)

        return self._wrap(self.df.select(*[swap(f) for f in self.df.schema.fields]))

    update = replace_value

    # -- ordered / positional ops (explicit order: SURVEY.md §3) ----------
    def _fresh(self, base: str) -> str:
        """Internal helper-column name guaranteed not to shadow a user
        column (a colliding name would be silently overwritten, then
        dropped — losing user data)."""
        name = base
        while name in self.df.columns:
            name = "_" + name
        return name

    def _nth_key_threshold(
        self, n: int, order_by: Sequence[ColumnLike], descending: bool = False
    ):
        """(order-key struct, 1-row broadcast n-th key in the requested
        direction, name).

        The threshold job runs over the KEY COLUMNS ONLY (column-pruned at
        the scan) as a top-n — per-partition pruning keeps at most n keys
        per task before the final merge — so no payload row ever passes
        through a global sort. NULL threshold ⇔ the stream is empty.
        ``descending`` flips both the top-n direction and the extremum
        (n-th LARGEST key instead of n-th smallest).
        """
        kname, tname = self._fresh("__key"), self._fresh("__thr")
        key = _order_key(order_by)
        thr = (
            self.df.select(key.alias(kname))
            .sort(F.col(kname).desc() if descending else F.col(kname))
            .limit(n)
            .agg((F.min if descending else F.max)(kname).alias(tname))
        )
        return key, F.broadcast(thr), tname

    def take(
        self,
        n: int,
        order_by: Sequence[ColumnLike] | None = None,
        descending: bool = False,
    ) -> "DataStream":
        """take (DataStream.scala:165). Without ``order_by`` this is a
        bare ``limit`` — an ARBITRARY n-row subset (fast: Spark stops
        scanning early), not the complement of ``drop(n, order_by)``.

        With ``order_by``: the first n of the total order, via the
        key-threshold plan (n-th key from a keys-only top-n aggregate,
        broadcast, parallel filter ``key ≤ threshold``) — a
        ``sort().limit(n)`` would fall back to a full global sort with a
        single-partition GlobalLimit once n exceeds Spark's top-k
        threshold. ``order_by`` must be a TOTAL order (unique keys, as
        the reference's arrival order is): rows tied with the n-th key
        would all be kept. ``descending=True`` takes the LAST n of the
        ascending order (all keys reversed together; per-key mixed
        directions aren't expressible with one struct comparison — invert
        individual keys instead)."""
        if order_by:
            key, thr, tname = self._nth_key_threshold(n, order_by, descending)
            keep = key >= F.col(tname) if descending else key <= F.col(tname)
            return self._wrap(self.df.crossJoin(thr).filter(keep).drop(tname))
        return self._wrap(self.df.limit(n))

    def drop(
        self,
        n: int,
        order_by: Sequence[ColumnLike],
        descending: bool = False,
    ) -> "DataStream":
        """drop(n) (DataStream.scala:200) over an explicit total order.

        Key-threshold plan (the scale answer to OFFSET): find the n-th
        order key with a keys-only top-n aggregate (per-partition pruning
        → at most n KEY STRUCTS per task reach the merge, never payload
        rows), broadcast it, and keep rows strictly beyond it with a
        parallel filter. A ``sort().offset(n)`` funnels the whole sorted
        dataset through one task to count n rows past it. Costs one extra
        column-pruned pass over the key columns — linear and parallel,
        versus a global sort. ``order_by`` must be a TOTAL order (unique
        keys): rows tied with the n-th key would all be dropped.
        ``descending=True`` drops the LAST n of the ascending order.
        """
        key, thr, tname = self._nth_key_threshold(n, order_by, descending)
        beyond = key < F.col(tname) if descending else key > F.col(tname)
        return self._wrap(
            self.df.crossJoin(thr)
            .filter(F.col(tname).isNull() | beyond)
            .drop(tname)
        )

    def _prefix_bound(self, predicate: Column | str, order_by: Sequence[ColumnLike]):
        """(order-key struct, 1-row broadcast min key where predicate FAILS).

        The prefix boundary is a global MIN — a partial+final aggregate,
        fully parallel. The obvious alternative (running-AND over an
        unpartitioned window) funnels every row through ONE partition:
        correct on a laptop, dead at 100 TB.
        """
        bname = self._fresh("__bound")
        key = _order_key(order_by)
        bound = self.df.filter(~_cond(predicate)).agg(F.min(key).alias(bname))
        return key, F.broadcast(bound), bname

    def take_while(self, predicate: Column | str, order_by: Sequence[ColumnLike]) -> "DataStream":
        """takeWhile (DataStream.scala:137): keep the maximal prefix (in the
        given order) where predicate holds = all rows strictly before the
        first failing row. Two parallel passes: global-min boundary, then a
        filtered scan — no single-partition window."""
        key, bound, bname = self._prefix_bound(predicate, order_by)
        return self._wrap(
            self.df.crossJoin(bound)
            .filter(F.col(bname).isNull() | (key < F.col(bname)))
            .drop(bname)
        )

    def drop_while(self, predicate: Column | str, order_by: Sequence[ColumnLike]) -> "DataStream":
        """dropWhile (DataStream.scala:214) — complement of take_while."""
        key, bound, bname = self._prefix_bound(predicate, order_by)
        return self._wrap(
            self.df.crossJoin(bound)
            .filter(F.col(bname).isNotNull() & (key >= F.col(bname)))
            .drop(bname)
        )

    def zip_with_index(self, name: str, order_by: Sequence[ColumnLike]) -> "DataStream":
        """0-based dense index over an explicit order (helper for concat).

        Distributed two-phase (the RDD ``zipWithIndex`` layout, kept in
        DataFrames): range-partition by the order columns so partition ids
        ascend with the order, count rows per partition (metadata-sized),
        prefix-sum the offsets, then ``offset + row_number within
        partition``. The per-partition window parallelizes; an
        unpartitioned ``row_number`` window would serialize the whole
        dataset through one task.
        """
        from pyspark import StorageLevel

        mid, pid, loc = self._fresh("__mid"), self._fresh("__pid"), self._fresh("__loc")
        cnt, off = self._fresh("__cnt"), self._fresh("__off")
        cols = [_col(c) for c in order_by]
        # local position = monotonically_increasing_id minus the partition
        # base (pid << 33): the id is sequential from 0 WITHIN a partition,
        # so after the in-partition sort it IS the local sort position —
        # no row_number window, hence no extra hash-by-pid shuffle.
        # PERSISTED: the counts branch and the output branch both read this
        # partitioning; relying on exchange reuse alone is unsound — with
        # reuse defeated (spark.sql.exchange.reuse=false, plan divergence)
        # each branch would re-SAMPLE range bounds, and rows near a bound
        # could land in different partitions per branch → wrong offsets.
        parted = (
            self.df.repartitionByRange(*cols)
            .sortWithinPartitions(*cols)
            .withColumn(mid, F.monotonically_increasing_id())
            .withColumn(pid, F.spark_partition_id())
            .withColumn(
                loc, F.col(mid) - F.shiftleft(F.col(pid).cast("long"), 33)
            )
        ).persist(StorageLevel.MEMORY_AND_DISK)
        counts = parted.groupBy(pid).agg(F.count(F.lit(1)).alias(cnt))
        wo = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.select(
            pid, F.coalesce(F.sum(cnt).over(wo), F.lit(0)).alias(off)
        )
        out = (
            parted.join(F.broadcast(offsets), pid)
            .withColumn(name, F.col(off) + F.col(loc))
            .drop(pid, off, mid, loc)
        )
        res = self._wrap(out)
        res._pinned.append(parted)  # released by the consumer's unpersist()
        return res

    def concat(
        self, other: "DataStream",
        order_left: Sequence[ColumnLike], order_right: Sequence[ColumnLike],
    ) -> "DataStream":
        """concat (DataStream.scala:380) — positional zip of two streams.

        The reference pairs rows by arrival order through a blocking queue;
        distributed version pairs by row index over explicit per-side
        orders, then equi-joins on the index.
        """
        idx = self._fresh("__zip_idx")
        while idx in other.df.columns:
            idx = "_" + idx
        left = self.zip_with_index(idx, order_left)
        right = other.zip_with_index(idx, order_right)
        res = self._wrap(left.df.join(right.df, idx, "inner").drop(idx))
        # both sides' range-partitioned intermediates release with ours
        # (identity-deduped: each side's list already carries upstream pins)
        seen = {id(df) for df in res._pinned}
        for df in left._pinned + right._pinned:
            if id(df) not in seen:
                res._pinned.append(df)
                seen.add(id(df))
        return res

    # -- combining streams -------------------------------------------------
    def union(self, other: "DataStream") -> "DataStream":
        """union/++ (DataStream.scala:685) — by name, schema-checked."""
        return self._wrap(self.df.unionByName(other.df))

    __add__ = union

    def _rowwise_match(self, other: "DataStream"):
        """All-columns null-safe equality between two streams' rows."""
        from functools import reduce

        l, r = self.df, other.df
        return l, r, reduce(
            lambda a, b: a & b,
            [l[c].eqNullSafe(r[c]) for c in self.df.columns],
        )

    def intersection(self, other: "DataStream") -> "DataStream":
        """intersection (DataStream.scala:745) — ``filter(rhs.contains)``:
        keeps EVERY left row (duplicates included) whose value appears in
        the other stream. A left-semi join on all columns, null-safe —
        NOT ``intersect``, which would deduplicate the left side."""
        l, r, cond = self._rowwise_match(other)
        return self._wrap(l.join(r, on=cond, how="left_semi"))

    def subtract(self, other: "DataStream") -> "DataStream":
        """substract [sic] (DataStream.scala:735) —
        ``filterNot(rhs.contains)``: removes EVERY left row (duplicates
        included) whose value appears in the other stream. A left-anti
        join on all columns, null-safe — NOT ``exceptAll``, whose
        per-occurrence multiset arithmetic lets duplicate matches
        survive."""
        l, r, cond = self._rowwise_match(other)
        return self._wrap(l.join(r, on=cond, how="left_anti"))

    def cartesian(self, other: "DataStream") -> "DataStream":
        """cartesian (DataStream.scala:267) — crossJoin; Spark broadcasts
        the smaller side (BroadcastNestedLoopJoin) instead of collecting it
        to the driver."""
        return self._wrap(self.df.crossJoin(other.df))

    def join(
        self, key: str | Sequence[str], other: "DataStream", how: str = "inner",
        broadcast_other: bool | None = None,
    ) -> "DataStream":
        """join(key, other) (DataStream.scala:426).

        The reference inflates the entire other stream into a driver-side
        hash map — its doc says "always use the smallest datastream as the
        parameter". Here the planner chooses broadcast vs shuffle by
        statistics (AQE included); ``broadcast_other=True`` forces the hint
        for known-small dimension tables.
        """
        keys = [key] if isinstance(key, str) else list(key)
        right = other.df
        if broadcast_other:
            right = F.broadcast(right)
        return self._wrap(self.df.join(right, on=keys, how=how))

    # -- grouping ----------------------------------------------------------
    def group_by(self, *keys: ColumnLike) -> "GroupedDataStream":
        """groupBy (DataStream.scala:248)."""
        from eel_spark.grouped import GroupedDataStream

        return GroupedDataStream(self.df, [_col(k) for k in keys])

    def aggregated(self) -> "GroupedDataStream":
        """aggregated() (DataStream.scala:241) — whole-dataset aggregation."""
        from eel_spark.grouped import GroupedDataStream

        return GroupedDataStream(self.df, [])

    # -- reshaping ---------------------------------------------------------
    def explode(self, column: ColumnLike, alias: str | None = None) -> "DataStream":
        """explode (DataStream.scala:856) — one row per array element,
        JVM-side generator (no Python flatMap)."""
        name = alias or (column if isinstance(column, str) else "col")
        exclude = column if isinstance(column, str) else None
        others = [c for c in self.df.columns if c != exclude]
        return self._wrap(self.df.select(*others, F.explode(_col(column)).alias(name)))

    def explode_rows(self, fn: Callable, schema: T.StructType | str) -> "DataStream":
        """eel's arbitrary Row=>Seq[Row] explode — Arrow-batched
        ``mapInPandas`` (pandas in, any number of rows out)."""
        return self._wrap(self.df.mapInPandas(fn, schema))

    # -- observability -----------------------------------------------------

    # --- round-6 fluent conveniences (beyond the reference surface) ---

    def melt(
        self,
        ids: Sequence[str],
        values: Sequence[str] | None = None,
        variable_name: str = "variable",
        value_name: str = "value",
    ) -> "DataStream":
        """Wide→long unpivot (native ``DataFrame.unpivot`` — a
        zero-shuffle Expand, the inverse of pivot). ``values`` defaults
        to every non-id column; mixed value types must be cast
        compatibly by the caller (Spark rejects incompatible unpivot
        columns loudly)."""
        vals = (
            list(values)
            if values is not None
            else [c for c in self.df.columns if c not in set(ids)]
        )
        return self._wrap(
            self.df.unpivot(list(ids), vals, variable_name, value_name)
        )

    def expect_schema(
        self, expected: T.StructType | str, allow_extra: bool = False
    ) -> "DataStream":
        """Schema contract gate: assert this stream's schema contains
        exactly (or at least, with ``allow_extra``) the expected fields
        with the expected types — the ingest-boundary check that turns
        silent upstream drift into a loud error BEFORE any compute.
        Nullability is not compared (Spark's inference of it is
        unstable across sources). Returns self for chaining.
        """
        want = (
            T._parse_datatype_string(expected)
            if isinstance(expected, str)
            else expected
        )
        have = {f.name: f.dataType for f in self.df.schema.fields}
        problems = []
        for f in want.fields:
            if f.name not in have:
                problems.append(f"missing column {f.name!r} ({f.dataType.simpleString()})")
            elif have[f.name] != f.dataType:
                problems.append(
                    f"column {f.name!r} is {have[f.name].simpleString()}, "
                    f"expected {f.dataType.simpleString()}"
                )
        if not allow_extra:
            extra = set(have) - {f.name for f in want.fields}
            if extra:
                problems.append(f"unexpected columns {sorted(extra)}")
        if problems:
            raise ValueError("schema contract violated: " + "; ".join(problems))
        return self

    def flatten_structs(self, sep: str = "_", max_depth: int | None = None) -> "DataStream":
        """Expand nested struct columns into flat leaves (see
        eel_spark.schema.flatten_structs — pure projection)."""
        from eel_spark.schema import flatten_structs as _flat

        return self._wrap(_flat(self.df, sep=sep, max_depth=max_depth))

    def validate(self, checks, raise_on_failure: bool = False):
        """One-pass data-quality expectations (see
        eel_spark.operators.expectations.validate): returns
        (all_passed, report). The fluent pre-publish gate."""
        from eel_spark.operators.expectations import validate as _validate

        return _validate(self.df, checks, raise_on_failure=raise_on_failure)

    def profile(self, cols: list[str] | None = None, top_k: int = 5) -> list[dict]:
        """One-aggregation column profile (see
        eel_spark.operators.profile.profile)."""
        from eel_spark.operators.profile import profile as _profile

        return _profile(self.df, cols=cols, top_k=top_k)

    def listener(self, name: str = "eel_metrics", *metrics: Column) -> tuple["DataStream", Observation]:
        """listener (DataStream.scala:302) — the Spark-native answer is an
        Observation: metrics computed during the action, no second pass."""
        obs = Observation(name)
        observed = self.df.observe(obs, *(metrics or [F.count(F.lit(1)).alias("rows")]))
        return self._wrap(observed), obs

    def tee(self) -> tuple["DataStream", "DataStream"]:
        """tee/multiplex (DataStream.scala:561,945) — in Spark the DAG is
        shareable; both returned streams reference the same lineage, and
        ``persist()`` makes the share physical."""
        return self, DataStream(self.df)

    def multiplex(self, n: int) -> list["DataStream"]:
        """multiplex (DataStream.scala:945): ``n`` independent branches of
        the stream. The reference fans one subscription out to n queues;
        here each branch shares the lineage and ``persist()`` makes the
        fan-out physical (one upstream materialization, n consumers)."""
        self.persist()
        return [DataStream(self.df) for _ in range(n)]

    def persist(self) -> "DataStream":
        self.df.persist()
        return self

    def unpersist(self, blocking: bool = False) -> "DataStream":
        """Release this stream's cache AND any intermediates persisted on
        its behalf (zip_with_index's range-partitioned table, concat's two
        index sides). Call after the consuming action completes; without
        it, repeated pipeline runs accumulate executor storage for the
        session lifetime (``spark.catalog.clearCache()`` is the blunt
        session-wide alternative).

        Pins are SHARED between streams derived from the same
        ``zip_with_index``/``concat`` ancestor (``_wrap`` hands each
        derivation the same pinned DataFrames): unpersisting one sibling
        evicts the cache the others still read. That is always safe —
        their actions recompute the range-partitioned intermediate — but
        costs the cache hit, so unpersist only after the LAST sibling's
        action (or accept the recompute)."""
        self.df.unpersist(blocking)
        for df in self._pinned:
            df.unpersist(blocking)
        self._pinned.clear()
        return self

    # -- actions -----------------------------------------------------------
    def collect(self) -> list:
        return self.df.collect()

    def collect_values(self) -> list[tuple]:
        return [tuple(r) for r in self.df.collect()]

    def count(self) -> int:
        return self.df.count()

    size = count

    def head(self):
        return self.df.first()

    def exists(self, predicate: Column | str) -> bool:
        """exists (DataStream.scala:927) — limit(1) short-circuits."""
        return self.df.filter(_cond(predicate)).limit(1).count() > 0

    def find(self, predicate: Column | str):
        """find (DataStream.scala:936)."""
        return self.df.filter(_cond(predicate)).first()

    def min_by(self, order: ColumnLike):
        """minBy (DataStream.scala:515) — single-pass min_by aggregate."""
        cols = [F.min_by(F.struct(*self.df.columns), _col(order))]
        return self.df.agg(*cols).first()[0]

    def max_by(self, order: ColumnLike):
        """maxBy (DataStream.scala:534)."""
        return self.df.agg(F.max_by(F.struct(*self.df.columns), _col(order))).first()[0]

    def to_set(self) -> set:
        """toSet (DataStream.scala:930) — rows as a set of value tuples."""
        return set(self.collect_values())

    def to_data_table(self):
        """toDataTable (DataStream.scala:1021) → pandas (Arrow transfer)."""
        return self.df.toPandas()

    def iterator(self):
        """iterator (DataStream.scala:285) — streamed to the driver
        partition-by-partition, never fully materialized."""
        return self.df.toLocalIterator()

    def to(self, sink, parallelism: int | None = None) -> int:
        """to(sink) (DataStream.scala:1011). Returns rows written."""
        return sink.write(self, parallelism=parallelism)

    # -- plan inspection ---------------------------------------------------
    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)


# ---------------------------------------------------------------------------
# constructors (DataStream.scala:1024-1096)
# ---------------------------------------------------------------------------

def from_values(
    spark: SparkSession, schema: T.StructType | list[str], values: Iterable[Sequence[Any]]
) -> DataStream:
    """DataStream.fromValues (DataStream.scala:1093)."""
    values = [tuple(v) for v in values]
    if isinstance(schema, list):
        schema = eel_schema.infer_schema(schema, values)
        # widening may choose double for a column holding ints (e.g.
        # [1, 2.5]); createDataFrame verifies types strictly, so coerce
        # those ints to float
        fractional = [
            isinstance(f.dataType, (T.DoubleType, T.FloatType))
            for f in schema.fields
        ]
        values = [
            tuple(
                float(v)
                if frac and isinstance(v, int) and not isinstance(v, bool)
                else v
                for v, frac in zip(row, fractional)
            )
            for row in values
        ]
    return DataStream(spark.createDataFrame(values, schema))


def from_rows(spark: SparkSession, schema: T.StructType, rows: Iterable[Any]) -> DataStream:
    """DataStream.fromRows (DataStream.scala:1064)."""
    return DataStream(spark.createDataFrame(list(rows), schema))

