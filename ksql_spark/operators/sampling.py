"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent on partitioning and engine version — fine
for statistics, useless for reproducible dataset cuts.  These operators
sample by PORTABLE HASH of the row key, so the same row set comes out on
any engine, any partitioning, any day (the DuckDB oracle recomputes the
exact membership):

  * hash_sample      — Bernoulli by key-hash bucket: keep iff
                       md5-hash(key) mod D < rate*D.  One codegen'd filter,
                       no shuffle, pushdown-friendly.
  * stratified_sample — per-stratum quota: rank rows inside each stratum by
                       (hash, key) and keep the first N.  One window shuffle
                       on the stratum key; the hash ordering makes the picks
                       uniform AND reproducible.

Reference analog: none (gulfstream-h/ksql has no sampling surface); this is
part of the §2.12 training-data extension family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash60

DENOM = 1_000_000  # rate resolution: 1e-6


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows keyed by ``key_col``.

    Membership depends only on the key value — stable under repartitioning,
    re-runs, engine changes; also usable as a consistent train/eval split
    (disjoint rate bands never overlap).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    bucket = F.pmod(portable_hash60(F.col(key_col).cast("string")), F.lit(DENOM))
    # round, don't truncate: 0.29 * 1e6 is 289999.99999999997 in float64
    return df.filter(bucket < round(rate * DENOM))


def sql_hash_sample(table: str, key_col: str, rate: float) -> str:
    """DuckDB twin of hash_sample (same md5-derived 60-bit hash)."""
    h = f"(('0x' || substr(md5({key_col}::varchar), 1, 15))::bigint % {DENOM})"
    return f"SELECT * FROM {table} WHERE {h} < {round(rate * DENOM)}"


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """Keep (up to) ``n_per_stratum`` rows per stratum, picked by hash order.

    The (hash, key) ordering is a uniform pseudo-random permutation of each
    stratum that any engine reproduces — reservoir sampling without the
    nondeterminism.  One shuffle on the stratum key.
    """
    from pyspark.sql.window import Window

    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    h = portable_hash60(F.col(key_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def sql_stratified_sample(table: str, stratum_col: str, key_col: str, n: int) -> str:
    h = f"('0x' || substr(md5({key_col}::varchar), 1, 15))::bigint"
    return f"""
        SELECT * EXCLUDE (__rn) FROM (
            SELECT *, row_number() OVER (PARTITION BY {stratum_col}
                                         ORDER BY {h} ASC, {key_col} ASC) AS __rn
            FROM {table}) WHERE __rn <= {n}
    """
