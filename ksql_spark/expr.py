"""Expression tree: fields, conditionals, arithmetic, CASE, aggregates, windows.

Re-implements the reference's expression node inventory (SURVEY.md §2.2–§2.5)
as lazy wrappers over ``pyspark.sql.Column``.  Each node knows how to lower
itself to a Column (``to_column``); Catalyst then handles resolution,
constant folding, pushdown and codegen — there is no string rendering in the
execution path (the reference renders KSQL strings because execution is
remote; ours is native).

Reference citations (all under /root/reference/):
  - Field + comparisons:      ksql/field.go:110-185, ksql/conditionals.go:101-201
  - nil -> IS NULL rewrite:   ksql/conditionals.go:183-193
  - IN / NOT IN:              ksql/field.go:149-156
  - And/Or lists:             ksql/expression_list.go:31-113
  - arithmetic (+ - * / %):   ksql/arithmetic.go:27-162 (must be aliased:
                              select_builder.go:779-782)
  - CASE WHEN:                ksql/case.go:39-132 (alias mandatory: 81-83)
  - aggregate functions:      ksql/aggregate_fn.go:9-275
  - windows:                  ksql/window.go:57-162
"""

from __future__ import annotations

import enum
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .errors import AnalysisError

# ---------------------------------------------------------------------------
# Core expression protocol
# ---------------------------------------------------------------------------


class Expr:
    """Base node. Subclasses implement ``to_column``."""

    alias_name: str | None = None

    def to_column(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def output(self) -> Column:
        """Column including alias, as it appears in a SELECT list."""
        col = self.to_column()
        if self.alias_name:
            return col.alias(self.alias_name)
        return col

    def output_name(self) -> str:
        if self.alias_name:
            return self.alias_name
        raise AnalysisError(f"derived field {self!r} requires an alias")

    # -- fluent alias (reference: field.go:70-73) --
    def Alias(self, name: str) -> "Expr":
        self.alias_name = name
        return self

    alias = Alias

    def is_aggregate(self) -> bool:
        return False

    # -- comparisons usable on any expression ------------------------------
    # Go nil -> None: `Equal(nil)` rewrites to IS NULL (conditionals.go:183-193)
    def Equal(self, other: Any) -> "Conditional":
        if other is None:
            return self.IsNull()
        return Conditional(self, "=", other)

    def NotEqual(self, other: Any) -> "Conditional":
        if other is None:
            return self.IsNotNull()
        return Conditional(self, "!=", other)

    def Greater(self, other: Any) -> "Conditional":
        return Conditional(self, ">", other)

    def GreaterEq(self, other: Any) -> "Conditional":
        return Conditional(self, ">=", other)

    def Less(self, other: Any) -> "Conditional":
        return Conditional(self, "<", other)

    def LessEq(self, other: Any) -> "Conditional":
        return Conditional(self, "<=", other)

    def IsNull(self) -> "Conditional":
        return Conditional(self, "IS NULL", None)

    def IsNotNull(self) -> "Conditional":
        return Conditional(self, "IS NOT NULL", None)

    def IsTrue(self) -> "Conditional":
        return Conditional(self, "IS TRUE", None)

    def IsFalse(self) -> "Conditional":
        return Conditional(self, "IS FALSE", None)

    def In(self, *values: Any) -> "Conditional":
        return Conditional(self, "IN", list(values))

    def NotIn(self, *values: Any) -> "Conditional":
        return Conditional(self, "NOT IN", list(values))

    # -- arithmetic (reference: arithmetic.go) -----------------------------
    def Add(self, other: Any) -> "Arithmetic":
        return Arithmetic(self, "+", other)

    def Sub(self, other: Any) -> "Arithmetic":
        return Arithmetic(self, "-", other)

    def Mul(self, other: Any) -> "Arithmetic":
        return Arithmetic(self, "*", other)

    def Div(self, other: Any) -> "Arithmetic":
        return Arithmetic(self, "/", other)

    def Mod(self, other: Any) -> "Arithmetic":
        return Arithmetic(self, "%", other)

    # -- ordering (reference: order_by.go:96-137, field.go:178-185) --------
    def Asc(self) -> "Ordering":
        return Ordering(self, ascending=True)

    def Desc(self) -> "Ordering":
        return Ordering(self, ascending=False)


def _as_column(value: Any) -> Column:
    """Lower an operand: Expr -> its Column, anything else -> literal."""
    if isinstance(value, Expr):
        return value.to_column()
    if isinstance(value, Column):
        return value
    return F.lit(value)


class Field(Expr):
    """Named column reference, optionally relation-qualified.

    Reference: ``ksql.F("name")`` / ``schema.col`` (ksql/field.go).
    Qualification (``F("s.id")``) resolves through DataFrame aliases, the
    Spark analog of the reference's relation-prefixed fields.
    """

    def __init__(self, name: str):
        self.name = name
        self.alias_name: str | None = None

    def to_column(self) -> Column:
        return F.col(self.name)

    def output_name(self) -> str:
        if self.alias_name:
            return self.alias_name
        return self.name.split(".")[-1]

    def __repr__(self) -> str:  # pragma: no cover
        return f"F({self.name!r})"


class Literal(Expr):
    """Explicit literal wrapper (reference serializes literals in util/types.go)."""

    def __init__(self, value: Any):
        self.value = value
        self.alias_name: str | None = None

    def to_column(self) -> Column:
        return F.lit(self.value)


class RawColumn(Expr):
    """Escape hatch wrapping a prebuilt Spark Column (alias required).

    Reference analog: ``database.Execute`` raw-query passthrough
    (database/database.go:14-34) — arbitrary expressions outside the
    closed builder surface.
    """

    def __init__(self, col: Column, alias: str | None = None):
        self._col = col
        self.alias_name = alias

    def to_column(self) -> Column:
        return self._col


# ---------------------------------------------------------------------------
# Conditionals
# ---------------------------------------------------------------------------


class BooleanExpr(Expr):
    """Any expression usable in WHERE/HAVING/ON."""

    def And(self, other: "BooleanExpr") -> "ExpressionList":
        return ExpressionList("AND", [self, other])

    def Or(self, other: "BooleanExpr") -> "ExpressionList":
        return ExpressionList("OR", [self, other])


class Conditional(BooleanExpr):
    """Binary comparison / null test / membership (ksql/conditionals.go)."""

    def __init__(self, left: Expr, op: str, right: Any):
        self.left = left
        self.op = op
        self.right = right
        self.alias_name: str | None = None

    def to_column(self) -> Column:
        lc = self.left.to_column()
        op = self.op
        if op == "=":
            return lc == _as_column(self.right)
        if op == "!=":
            return lc != _as_column(self.right)
        if op == ">":
            return lc > _as_column(self.right)
        if op == ">=":
            return lc >= _as_column(self.right)
        if op == "<":
            return lc < _as_column(self.right)
        if op == "<=":
            return lc <= _as_column(self.right)
        if op == "IS NULL":
            return lc.isNull()
        if op == "IS NOT NULL":
            return lc.isNotNull()
        if op == "IS TRUE":
            return lc == F.lit(True)
        if op == "IS FALSE":
            return lc == F.lit(False)
        if op == "IN":
            return lc.isin(*self.right)
        if op == "NOT IN":
            return ~lc.isin(*self.right)
        raise AnalysisError(f"unknown conditional op {op!r}")


class ExpressionList(BooleanExpr):
    """Nested AND/OR combinator, parenthesized (ksql/expression_list.go:31-113)."""

    def __init__(self, op: str, exprs: Sequence[BooleanExpr]):
        if not exprs:
            raise AnalysisError(f"{op}() requires at least one expression")
        self.op = op
        self.exprs = list(exprs)
        self.alias_name: str | None = None

    def to_column(self) -> Column:
        cols = [e.to_column() for e in self.exprs]
        acc = cols[0]
        for c in cols[1:]:
            acc = (acc & c) if self.op == "AND" else (acc | c)
        return acc


def And(*exprs: BooleanExpr) -> ExpressionList:
    return ExpressionList("AND", exprs)


def Or(*exprs: BooleanExpr) -> ExpressionList:
    return ExpressionList("OR", exprs)


# ---------------------------------------------------------------------------
# Arithmetic & CASE (derived fields: alias mandatory — select_builder.go:779-782)
# ---------------------------------------------------------------------------


class Arithmetic(Expr):
    def __init__(self, left: Any, op: str, right: Any):
        self.left = left
        self.op = op
        self.right = right
        self.alias_name: str | None = None

    def to_column(self) -> Column:
        lc = _as_column(self.left)
        rc = _as_column(self.right)
        if self.op == "+":
            return lc + rc
        if self.op == "-":
            return lc - rc
        if self.op == "*":
            return lc * rc
        if self.op == "/":
            return lc / rc
        if self.op == "%":
            return lc % rc
        raise AnalysisError(f"unknown arithmetic op {self.op!r}")


class Case(Expr):
    """Searched CASE (ksql/case.go:39-132); alias mandatory (case.go:81-83)."""

    def __init__(self):
        self.branches: list[tuple[BooleanExpr, Any]] = []
        self.else_value: Any = None
        self.has_else = False
        self.alias_name: str | None = None

    def When(self, cond: BooleanExpr, then: Any) -> "Case":
        self.branches.append((cond, then))
        return self

    def Else(self, value: Any) -> "Case":
        self.else_value = value
        self.has_else = True
        return self

    def to_column(self) -> Column:
        if not self.branches:
            raise AnalysisError("CASE requires at least one WHEN branch")
        col = F.when(self.branches[0][0].to_column(), _as_column(self.branches[0][1]))
        for cond, then in self.branches[1:]:
            col = col.when(cond.to_column(), _as_column(then))
        if self.has_else:
            col = col.otherwise(_as_column(self.else_value))
        return col


# ---------------------------------------------------------------------------
# Aggregate functions (ksql/aggregate_fn.go:9-275)
# ---------------------------------------------------------------------------


class AggregateFn(Expr):
    """Base aggregate. Alias mandatory (derived-field rule)."""

    def __init__(self, arg: Expr):
        self.arg = arg
        self.alias_name: str | None = None

    def is_aggregate(self) -> bool:
        return True

    # aggregates are comparable for HAVING (reference: field.go:222-299)


class Count(AggregateFn):
    def to_column(self) -> Column:
        return F.count(self.arg.to_column())


class Sum(AggregateFn):
    def to_column(self) -> Column:
        return F.sum(self.arg.to_column())


class Avg(AggregateFn):
    def to_column(self) -> Column:
        return F.avg(self.arg.to_column())


class Min(AggregateFn):
    def to_column(self) -> Column:
        return F.min(self.arg.to_column())


class Max(AggregateFn):
    def to_column(self) -> Column:
        return F.max(self.arg.to_column())


class CollectList(AggregateFn):
    """COLLECT_LIST with the engine's stable-ordering contract.

    ``collect_list`` alone is shuffle-order-dependent; the parity invariant
    (BASELINE.json input_hint: "per-turn text equality under stable turn
    ordering") demands determinism, so we collect ``struct(order_key, value)``
    and ``sort_array`` (SURVEY.md §7 "what's hard").  ``order_by`` defaults to
    the value itself.
    """

    def __init__(self, arg: Expr, order_by: Sequence[Expr] | None = None):
        super().__init__(arg)
        self.order_by = list(order_by) if order_by else None

    def to_column(self) -> Column:
        if self.order_by:
            keys = [o.to_column() for o in self.order_by]
            paired = F.collect_list(F.struct(*keys, self.arg.to_column().alias("__v")))
            return F.transform(F.sort_array(paired), lambda s: s["__v"])
        return F.sort_array(F.collect_list(self.arg.to_column()))


class CollectSet(AggregateFn):
    def to_column(self) -> Column:
        # sort for deterministic output (set iteration order is undefined)
        return F.sort_array(F.collect_set(self.arg.to_column()))


class LatestByOffset(AggregateFn):
    """LATEST_BY_OFFSET (aggregate_fn.go:143-148).

    ksqlDB orders by Kafka offset; a native engine has no offsets, so the
    documented parity contract (SURVEY.md §7) is offset := the relation's
    event-order key — ``struct(ts, turn_idx)`` for transcripts.  Lowered to
    ``max_by(value, struct(order...))`` which is a plain hash aggregate
    (no sort, no shuffle beyond the groupBy).
    """

    def __init__(self, arg: Expr, order_by: Sequence[Expr] | None = None):
        super().__init__(arg)
        self.order_by = list(order_by) if order_by else None

    def _order_col(self) -> Column:
        if not self.order_by:
            raise AnalysisError(
                "LATEST/EARLIEST_BY_OFFSET needs an event-order key: pass "
                "order_by=[...] or query a relation with a declared event order"
            )
        return F.struct(*[o.to_column() for o in self.order_by])

    def to_column(self) -> Column:
        return F.max_by(self.arg.to_column(), self._order_col())


class EarliestByOffset(LatestByOffset):
    def to_column(self) -> Column:
        return F.min_by(self.arg.to_column(), self._order_col())


class TopK(AggregateFn):
    """TOPK(col, k) (aggregate_fn.go:159-196) — exact, like ksqlDB.

    Lowered to sort_array(collect_list)[1:k].  Exactness is part of the
    parity contract (no approx sketches); for bounded-cardinality groups
    this is a single hash-agg.
    """

    def __init__(self, arg: Expr, k: int):
        super().__init__(arg)
        if k <= 0:
            raise AnalysisError("TOPK requires k > 0")
        self.k = k

    def to_column(self) -> Column:
        return F.slice(F.sort_array(F.collect_list(self.arg.to_column()), asc=False), 1, self.k)


class TopKDistinct(TopK):
    """TOPK_DISTINCT(col, k) (aggregate_fn.go:199-235)."""

    def to_column(self) -> Column:
        return F.slice(F.sort_array(F.collect_set(self.arg.to_column()), asc=False), 1, self.k)


class Histogram(AggregateFn):
    """HISTOGRAM(col) (aggregate_fn.go:238-275): value -> count map.

    ksqlDB caps entries; we keep the cap argument and enforce it on the
    most frequent values (ties broken by value for determinism).
    """

    def __init__(self, arg: Expr, buckets: int = 20):
        super().__init__(arg)
        if buckets <= 0:
            raise AnalysisError("HISTOGRAM requires buckets > 0")
        self.buckets = buckets

    def to_column(self) -> Column:
        # Single hash-agg: fold the collected values into a value->count map,
        # keep the `buckets` most frequent entries (tie-break on value for
        # determinism).  The fold is O(group²) worst case — fine for the
        # bounded-cardinality groups HISTOGRAM is meant for; the compiler's
        # scale path for huge groups is a two-level groupBy (SURVEY.md §2.4).
        return F.map_from_entries(
            F.transform(
                F.slice(
                    F.sort_array(
                        F.transform(
                            F.map_entries(
                                F.aggregate(
                                    F.collect_list(self.arg.to_column()),
                                    F.create_map().cast("map<string,bigint>"),
                                    lambda acc, v: F.map_concat(
                                        F.map_filter(acc, lambda k, _: k != v.cast("string")),
                                        F.create_map(
                                            v.cast("string"),
                                            F.coalesce(acc[v.cast("string")], F.lit(0)) + 1,
                                        ),
                                    ),
                                )
                            ),
                            lambda e: F.struct(
                                (-e["value"]).alias("neg"),
                                e["key"].alias("key"),
                                e["value"].alias("cnt"),
                            ),
                        )
                    ),
                    1,
                    self.buckets,
                ),
                lambda s: F.struct(s["key"].alias("key"), s["cnt"].alias("value")),
            )
        )


# ---------------------------------------------------------------------------
# Windows (ksql/window.go:57-162)
# ---------------------------------------------------------------------------


class TimeUnit(enum.Enum):
    MILLISECONDS = "milliseconds"
    SECONDS = "seconds"
    MINUTES = "minutes"
    HOURS = "hours"
    DAYS = "days"


def _duration(n: int, unit: TimeUnit) -> str:
    if n <= 0:
        raise AnalysisError(f"window duration must be positive, got {n}")
    return f"{n} {unit.value}"


class WindowSpec:
    kind: str = ""

    def grouping_column(self, ts_col: str) -> Column:  # pragma: no cover
        raise NotImplementedError


class TumblingWindow(WindowSpec):
    """WINDOW TUMBLING (SIZE n U) (window.go:66-71, 112-124)."""

    kind = "tumbling"

    def __init__(self, size: int, unit: TimeUnit = TimeUnit.SECONDS):
        self.duration = _duration(size, unit)

    def grouping_column(self, ts_col: str) -> Column:
        return F.window(F.col(ts_col), self.duration)


class HoppingWindow(WindowSpec):
    """WINDOW HOPPING (SIZE s, ADVANCE BY a) (window.go:74-80, 127-148)."""

    kind = "hopping"

    def __init__(self, size: int, advance: int, unit: TimeUnit = TimeUnit.SECONDS):
        if advance > size:
            raise AnalysisError("HOPPING window advance must be <= size")
        self.duration = _duration(size, unit)
        self.slide = _duration(advance, unit)

    def grouping_column(self, ts_col: str) -> Column:
        return F.window(F.col(ts_col), self.duration, self.slide)


class SessionWindow(WindowSpec):
    """WINDOW SESSION (gap U) (window.go:83-88, 151-162)."""

    kind = "session"

    _SECONDS = {
        TimeUnit.MILLISECONDS: 0.001,
        TimeUnit.SECONDS: 1,
        TimeUnit.MINUTES: 60,
        TimeUnit.HOURS: 3600,
        TimeUnit.DAYS: 86400,
    }

    def __init__(self, gap: int, unit: TimeUnit = TimeUnit.SECONDS):
        self.gap = _duration(gap, unit)
        self.gap_seconds = gap * self._SECONDS[unit]

    def grouping_column(self, ts_col: str) -> Column:
        return F.session_window(F.col(ts_col), self.gap)


# ---------------------------------------------------------------------------
# Ordering
# ---------------------------------------------------------------------------


class Ordering:
    """ORDER BY item (ksql/order_by.go:96-137)."""

    def __init__(self, expr: Expr, ascending: bool = True):
        self.expr = expr
        self.ascending = ascending

    def to_column(self) -> Column:
        col = self.expr.to_column()
        return col.asc() if self.ascending else col.desc()
