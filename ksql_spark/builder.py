"""Fluent statement builders: the reference's public query surface.

Mirrors the reference's builder API (ksql/select_builder.go, create_builder.go,
insert_builder.go, drop_builder.go, list_builder.go, describe_builder.go) —
method names kept Go-style for drop-in familiarity — but instead of rendering
KSQL strings, a builder IS the logical plan; ``ksql_spark.operators.compile``
lowers it to a DataFrame.

The 6 select semantic rules (select_builder.go:127-187) and the 2 create rules
(create_builder.go:45-73) are enforced in ``SelectBuilder.validate`` /
``CreateBuilder.validate`` so invalid plans fail before any Spark job starts,
matching the reference's client-side rejection behavior.
"""

from __future__ import annotations

import enum
from typing import Any, Sequence

from .errors import AnalysisError
from .expr import (
    AggregateFn,
    Arithmetic,
    BooleanExpr,
    Case,
    Expr,
    Field,
    Ordering,
    WindowSpec,
)
from .types import SchemaField


class Ref(enum.Enum):
    """Relation kinds (ksql/reference.go:8-12)."""

    STREAM = "STREAM"
    TABLE = "TABLE"
    TOPIC = "TOPIC"


STREAM = Ref.STREAM
TABLE = Ref.TABLE
TOPIC = Ref.TOPIC


class EmitMode(enum.Enum):
    """Emission modes (SURVEY.md §2.6).

    NONE    -> one-shot pull (batch read of materialized state)
    CHANGES -> push changelog (Structured Streaming update mode)
    FINAL   -> final-per-window only (append mode + watermark)
    """

    NONE = "NONE"
    CHANGES = "CHANGES"
    FINAL = "FINAL"


class FromExpression:
    """Source relation binding (ksql/from.go:24-73)."""

    def __init__(self, name: str, ref: Ref):
        self.name = name
        self.ref = ref
        self.alias: str | None = None

    def As(self, alias: str) -> "FromExpression":
        self.alias = alias
        return self

    def effective_name(self) -> str:
        return self.alias or self.name


def Schema(name: str, ref: Ref) -> FromExpression:
    """Reference: ``ksql.Schema(name, ref)`` (from.go:24-38)."""
    return FromExpression(name, ref)


class JoinKind(enum.Enum):
    """Join types (ksql/join.go:28-34; CROSS latent, join.go:84-85)."""

    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    OUTER = "full_outer"
    CROSS = "cross"


class JoinSpec:
    """One left-deep join step (select_builder.go:380-396, 586-594).

    ``within`` is the engine's stream-stream time bound (seconds): Spark
    requires a time-range condition + watermarks for state cleanup on
    stream-stream joins (SURVEY.md §2.3); ksqlDB's WITHIN clause is the
    same concept.
    """

    def __init__(
        self,
        kind: JoinKind,
        source: FromExpression,
        on: BooleanExpr | None,
        within_seconds: int | None = None,
    ):
        if kind != JoinKind.CROSS and on is None:
            raise AnalysisError(f"{kind.value} join requires an ON condition")
        self.kind = kind
        self.source = source
        self.on = on
        self.within_seconds = within_seconds


class SelectBuilder:
    """The SELECT logical plan (reference: selectBuilder, select_builder.go:62-98)."""

    def __init__(self, *fields: Expr | str):
        self.fields: list[Expr] = [Field(f) if isinstance(f, str) else f for f in fields]
        self.from_expr: FromExpression | None = None
        self.joins: list[JoinSpec] = []
        self.where_exprs: list[BooleanExpr] = []
        self.group_by: list[Expr] = []
        self.window: WindowSpec | None = None
        self.having_exprs: list[BooleanExpr] = []
        self.order_by: list[Ordering] = []
        self.limit_n: int | None = None
        self.emit: EmitMode = EmitMode.NONE
        self.cte: tuple[str, "SelectBuilder"] | None = None  # single CTE (§2.8)
        # set operations (engine extension; absent from the reference,
        # SURVEY.md §2.7): ("union" | "union_all", operand)
        self.set_ops: list[tuple[str, "SelectBuilder"]] = []

    # -- FROM ----------------------------------------------------------------
    def From(self, source: FromExpression | str, ref: Ref = Ref.STREAM) -> "SelectBuilder":
        if isinstance(source, str):
            source = FromExpression(source, ref)
        self.from_expr = source
        return self

    # -- joins (select_builder.go:329-374) ------------------------------------
    def Join(self, source: FromExpression, on: BooleanExpr, within_seconds: int | None = None):
        self.joins.append(JoinSpec(JoinKind.INNER, source, on, within_seconds))
        return self

    def LeftJoin(self, source: FromExpression, on: BooleanExpr, within_seconds: int | None = None):
        self.joins.append(JoinSpec(JoinKind.LEFT, source, on, within_seconds))
        return self

    def RightJoin(self, source: FromExpression, on: BooleanExpr, within_seconds: int | None = None):
        self.joins.append(JoinSpec(JoinKind.RIGHT, source, on, within_seconds))
        return self

    def OuterJoin(self, source: FromExpression, on: BooleanExpr, within_seconds: int | None = None):
        self.joins.append(JoinSpec(JoinKind.OUTER, source, on, within_seconds))
        return self

    def CrossJoin(self, source: FromExpression):
        self.joins.append(JoinSpec(JoinKind.CROSS, source, None))
        return self

    # -- WHERE: conjunctive list (ksql/where.go:10-75) -------------------------
    def Where(self, *conds: BooleanExpr) -> "SelectBuilder":
        self.where_exprs.extend(conds)
        return self

    # -- GROUP BY (ksql/groupby.go:10-74) --------------------------------------
    def GroupBy(self, *fields: Expr | str) -> "SelectBuilder":
        self.group_by.extend(Field(f) if isinstance(f, str) else f for f in fields)
        return self

    # -- WINDOW (ksql/window.go) -----------------------------------------------
    def WindowedBy(self, window: WindowSpec) -> "SelectBuilder":
        self.window = window
        return self

    # -- HAVING ------------------------------------------------------------------
    def Having(self, *conds: BooleanExpr) -> "SelectBuilder":
        self.having_exprs.extend(conds)
        return self

    # -- ORDER BY / LIMIT ---------------------------------------------------------
    def OrderBy(self, *orders: Ordering | Expr | str) -> "SelectBuilder":
        for o in orders:
            if isinstance(o, Ordering):
                self.order_by.append(o)
            elif isinstance(o, str):
                self.order_by.append(Ordering(Field(o)))
            else:
                self.order_by.append(Ordering(o))
        return self

    def Limit(self, n: int) -> "SelectBuilder":
        # LIMIT is absent from the reference builder (SURVEY.md §2.7);
        # engine extension, trivially lowered to df.limit(n).
        if n < 0:
            raise AnalysisError("LIMIT must be >= 0")
        self.limit_n = n
        return self

    # -- EMIT (select_builder.go:231-245) -----------------------------------------
    def EmitChanges(self) -> "SelectBuilder":
        if self.emit == EmitMode.FINAL:
            raise AnalysisError("EMIT FINAL and EMIT CHANGES are mutually exclusive")
        self.emit = EmitMode.CHANGES
        return self

    def EmitFinal(self) -> "SelectBuilder":
        if self.emit == EmitMode.CHANGES:
            raise AnalysisError("EMIT FINAL and EMIT CHANGES are mutually exclusive")
        self.emit = EmitMode.FINAL
        return self

    # -- set operations (engine extension, SURVEY.md §2.7) -------------------------
    def Union(self, other: "SelectBuilder") -> "SelectBuilder":
        """UNION (distinct).  Batch/pull only — dedup over an unbounded
        stream needs unbounded state; streaming callers get UNION ALL."""
        self.set_ops.append(("union", other))
        return self

    def UnionAll(self, other: "SelectBuilder") -> "SelectBuilder":
        self.set_ops.append(("union_all", other))
        return self

    def Intersect(self, other: "SelectBuilder") -> "SelectBuilder":
        """INTERSECT (distinct).  Batch/pull only, like Union."""
        self.set_ops.append(("intersect", other))
        return self

    def Except(self, other: "SelectBuilder") -> "SelectBuilder":
        """EXCEPT (distinct).  Batch/pull only, like Union."""
        self.set_ops.append(("except", other))
        return self

    # -- CTE (select_builder.go:467-472; one CTE max, like ksqlDB) -----------------
    def With(self, alias: str, sub: "SelectBuilder") -> "SelectBuilder":
        if self.cte is not None:
            raise AnalysisError("only one CTE is supported per query")
        if not alias:
            raise AnalysisError("CTE requires an alias")
        self.cte = (alias, sub)
        return self

    # -- analysis -------------------------------------------------------------------
    def has_aggregates(self) -> bool:
        return any(f.is_aggregate() for f in self.fields)

    def all_fields_aggregated(self) -> bool:
        return bool(self.fields) and all(f.is_aggregate() for f in self.fields)

    def validate(self) -> None:
        """The reference's 6 select rules (select_builder.go:127-187) + alias rules."""
        if self.from_expr is None:
            raise AnalysisError("SELECT requires FROM")
        if not self.fields:
            raise AnalysisError("SELECT requires at least one field")

        is_stream = self.from_expr.ref == Ref.STREAM
        is_table = self.from_expr.ref == Ref.TABLE

        # (5) EMIT FINAL only valid with a windowed aggregate — checked first
        # so the specific error wins over rule (1) (select_builder.go:164-169)
        if self.emit == EmitMode.FINAL and self.window is None:
            raise AnalysisError("EMIT FINAL requires a WINDOW (select_builder.go:164-169)")
        # (1) GROUP BY on a STREAM requires a WINDOW unless EMIT CHANGES
        if is_stream and self.group_by and self.window is None and self.emit != EmitMode.CHANGES:
            raise AnalysisError(
                "GROUP BY on a STREAM requires a WINDOW unless EMIT CHANGES "
                "(select_builder.go:131-137)"
            )
        # (2) HAVING requires GROUP BY
        if self.having_exprs and not self.group_by:
            raise AnalysisError("HAVING requires GROUP BY (select_builder.go:140-145)")
        # (3) aggregate functions require GROUP BY when all selected fields aggregated
        if self.all_fields_aggregated() and not self.group_by and is_stream and self.emit != EmitMode.NONE:
            raise AnalysisError(
                "aggregate-only SELECT on a stream requires GROUP BY "
                "(select_builder.go:148-153)"
            )
        # (4) WINDOW not allowed on TABLE
        if is_table and self.window is not None:
            raise AnalysisError("WINDOW is not allowed on a TABLE (select_builder.go:156-161)")
        # (6) mutual exclusivity enforced in EmitChanges/EmitFinal setters.

        # mixed agg/non-agg projection must group by the non-agg fields
        if self.has_aggregates() and not self.all_fields_aggregated() and not self.group_by:
            raise AnalysisError("mixing aggregates and plain fields requires GROUP BY")

        # derived-field alias rule (select_builder.go:768-794)
        for f in self.fields:
            if isinstance(f, (AggregateFn, Arithmetic, Case)) and not f.alias_name:
                raise AnalysisError(
                    f"derived field {type(f).__name__} must be aliased "
                    "(select_builder.go:779-782)"
                )

        # set-operation operands must themselves be valid
        for _, other in self.set_ops:
            other.validate()

    def output_names(self) -> list[str]:
        """Projected column names (reference: sb.Returns(), select_builder.go:663-704)."""
        self.validate()
        names = [f.output_name() for f in self.fields]
        if self.window is not None:
            names = ["window_start", "window_end", *names]
        return names


def Select(*fields: Expr | str) -> SelectBuilder:
    return SelectBuilder(*fields)


def SelectStruct(fields: Sequence[SchemaField]) -> SelectBuilder:
    """Projection from a declared schema (reference: SelectStruct, select_builder.go:264-285)."""
    return SelectBuilder(*[Field(f.name) for f in fields])


# ---------------------------------------------------------------------------
# CREATE / INSERT / DROP / LIST / DESCRIBE
# ---------------------------------------------------------------------------


class CreateBuilder:
    """CREATE STREAM/TABLE [AS SELECT] (ksql/create_builder.go:76-209)."""

    def __init__(self, ref: Ref, name: str):
        if ref == Ref.TOPIC:
            raise AnalysisError("cannot CREATE a TOPIC relation")
        self.ref = ref
        self.name = name
        self.schema_fields: list[SchemaField] = []
        self.select: SelectBuilder | None = None
        self.metadata: dict[str, Any] = {}

    def SchemaFields(self, *fields: SchemaField) -> "CreateBuilder":
        self.schema_fields.extend(fields)
        return self

    def AsSelect(self, sb: SelectBuilder) -> "CreateBuilder":
        self.select = sb
        return self

    def With(self, **metadata: Any) -> "CreateBuilder":
        """WITH(...) metadata (ksql/metadata.go:10-56): topic, value_format,
        partitions, timestamp (event-time column), timestamp_format."""
        self.metadata.update(metadata)
        return self

    def validate(self) -> None:
        """Create rule set (create_builder.go:45-73)."""
        if self.schema_fields and self.select is not None:
            raise AnalysisError("CREATE takes SchemaFields or AsSelect, not both")
        if not self.schema_fields and self.select is None:
            raise AnalysisError("CREATE requires SchemaFields or AsSelect")
        if self.ref == Ref.TABLE and self.schema_fields:
            if not any(f.is_primary for f in self.schema_fields):
                raise AnalysisError("CREATE TABLE requires a PRIMARY KEY (create_builder.go:179-181)")
        if self.select is not None:
            self.select.validate()
            src = self.select.from_expr
            assert src is not None
            # no STREAM from TABLE (create_builder.go:45-73)
            if self.ref == Ref.STREAM and src.ref == Ref.TABLE:
                raise AnalysisError("cannot CREATE STREAM from a TABLE source")
            # no TABLE from a non-aggregated STREAM select
            if self.ref == Ref.TABLE and src.ref == Ref.STREAM and not self.select.group_by:
                raise AnalysisError("CREATE TABLE from a STREAM requires aggregation")


def Create(ref: Ref, name: str) -> CreateBuilder:
    return CreateBuilder(ref, name)


Row = dict  # ksql.Row = map[string]any (ksql/insert_builder.go:24)


class InsertBuilder:
    """INSERT INTO ... VALUES / AS SELECT (ksql/insert_builder.go:56-161)."""

    def __init__(self, ref: Ref, name: str):
        if ref == Ref.TABLE:
            # tables are not insertable in the reference (README.md:358)
            raise AnalysisError("INSERT into a TABLE is not supported; insert into its source stream")
        self.ref = ref
        self.name = name
        self.rows: list[dict[str, Any]] = []
        self.select: SelectBuilder | None = None

    def Rows(self, *rows: dict[str, Any]) -> "InsertBuilder":
        for r in rows:
            if not r:
                raise AnalysisError("INSERT row must be non-empty")
            for v in r.values():
                if v is None:
                    # reference rejects nil values (insert_builder_test.go nil -> error)
                    raise AnalysisError("INSERT VALUES may not contain nil")
        self.rows.extend(rows)
        return self

    def InsertStruct(self, obj: Any) -> "InsertBuilder":
        row = {k: v for k, v in vars(obj).items() if not k.startswith("_")}
        return self.Rows(row)

    def AsSelect(self, sb: SelectBuilder) -> "InsertBuilder":
        self.select = sb
        return self

    def validate(self) -> None:
        if bool(self.rows) == bool(self.select is not None):
            raise AnalysisError("INSERT requires exactly one of Rows(...) or AsSelect(...)")


def Insert(ref: Ref, name: str) -> InsertBuilder:
    return InsertBuilder(ref, name)


class DropBuilder:
    """DROP STREAM/TABLE (ksql/drop_builder.go:21-49)."""

    def __init__(self, ref: Ref, name: str):
        self.ref = ref
        self.name = name


def Drop(ref: Ref, name: str) -> DropBuilder:
    return DropBuilder(ref, name)


class ListBuilder:
    """LIST STREAMS/TABLES/TOPICS (ksql/list_builder.go:19-41)."""

    def __init__(self, ref: Ref):
        self.ref = ref


def List(ref: Ref) -> ListBuilder:
    return ListBuilder(ref)


class DescribeBuilder:
    """DESCRIBE <relation> (ksql/describe_builder.go:24-57)."""

    def __init__(self, ref: Ref, name: str):
        self.ref = ref
        self.name = name


def Describe(ref: Ref, name: str) -> DescribeBuilder:
    return DescribeBuilder(ref, name)
