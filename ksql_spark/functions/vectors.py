"""Vector math over ``array<float>`` embedding columns — pure built-ins.

``F.zip_with`` + ``F.aggregate`` keep the dot product inside whole-stage
codegen; no UDF, no Python, no serialization of vectors out of the JVM.
DuckDB oracle twins use list_dot_product / sqrt(list_sum(...)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def vec_lit(values: list[float]) -> Column:
    """Embed a query vector as an array literal (broadcast to every row)."""
    return F.array(*[F.lit(float(v)) for v in values])


# DuckDB twins ({a}/{b} are column or list-literal placeholders)
SQL_DOT = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1]::double * p[2]::double))"
SQL_NORM = "sqrt(list_sum(list_transform({a}, x -> x::double * x::double)))"


def sql_cosine(a: str, b: str) -> str:
    d = f"({SQL_NORM.format(a=a)} * {SQL_NORM.format(a=b)})"
    return f"(CASE WHEN {d} > 0 THEN {SQL_DOT.format(a=a, b=b)} / {d} ELSE 0.0 END)"
