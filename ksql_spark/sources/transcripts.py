"""Deterministic synthetic multi-turn transcript generator.

Produces the engine's mandated input shape (BASELINE.json input_hint):
``conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp`` with the FIXTURES.md properties:

  * Zipf-skewed conversation lengths (a few very long conversations) so
    skew handling is actually exercised,
  * stable turn ordering (``turn_idx`` dense 0..len-1 per conversation),
  * timestamps derived arithmetically from a fixed base epoch — no
    wall-clock anywhere,
  * a deterministic fraction of late/out-of-order rows (every 17th turn of
    a conversation shifted -90s) for watermark tests.

Everything is generated Spark-side with built-in functions over
``spark.range`` — no Python loops, no per-row UDFs — so the same generator
produces 2k turns for a unit test or 10^8+ turns for a bench run, fully
distributed.  All pseudo-randomness is ``xxhash64(..., seed)``-derived and
therefore reproducible cluster-independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = "2026-01-01 00:00:00"  # FIXTURES.md §4
ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "code", "browse"]
_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "query", "stream", "window", "shuffle",
    "partition", "watermark",
]


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    avg_turns: int = 10,
    seed: int = 42,
    skew_max_turns: int | None = None,
    late_every: int = 17,
    turn_gap_seconds: int = 25,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame.

    Conversation ``i`` gets a Zipf-ish length ``max(2, min(cap,
    int(avg_turns * n_convs**0.35 / (i+1)**0.7)))`` floored at ``avg_turns/2``
    for the tail — conversation 0 is hundreds of times longer than the
    median, which is exactly the skewed-key case the north rule calls out.
    """
    cap = skew_max_turns or max(avg_turns * 50, 500)
    base = spark.range(n_convs, numPartitions=partitions)
    convs = base.select(
        F.format_string("conv%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_i"),
        F.greatest(
            F.lit(2),
            F.least(
                F.lit(cap),
                (
                    F.lit(float(avg_turns))
                    * F.pow(F.lit(float(n_convs)), F.lit(0.35))
                    / F.pow(F.col("id") + 1.0, F.lit(0.7))
                ).cast("int"),
            ),
            # tail floor so total volume stays ~ n_convs * avg_turns/2
            (F.lit(avg_turns // 2) + F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(avg_turns))).cast(
                "int"
            ),
        ).alias("n_turns"),
    )

    turns = convs.select(
        "conv_id",
        "conv_i",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h = F.xxhash64("conv_id", "turn_idx", F.lit(seed))
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), F.pmod(F.col("turn_idx"), 4) + 1)
    tool = F.when(
        role == "tool",
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]), F.pmod(F.abs(h), 3).cast("int") + 1),
    ).otherwise(F.lit(None).cast("string"))

    # deterministic filler: 4 vocab words selected by independent hashes
    words = [
        F.element_at(
            F.array(*[F.lit(w) for w in _VOCAB]),
            F.pmod(F.abs(F.xxhash64("conv_id", "turn_idx", F.lit(seed + k))), len(_VOCAB)).cast(
                "int"
            )
            + 1,
        )
        for k in range(4)
    ]
    text = F.concat_ws(
        " ",
        F.format_string("turn %d of", F.col("turn_idx")),
        F.col("conv_id"),
        F.lit(":"),
        *words,
    )

    # ts = base + conv offset + turn_idx*gap; every `late_every`-th turn of a
    # conversation arrives 90s late (deterministic late-row injection)
    conv_offset = F.pmod(F.col("conv_i") * 37, 86400)
    raw_ts = (
        F.unix_timestamp(F.lit(BASE_EPOCH), "yyyy-MM-dd HH:mm:ss")
        + conv_offset
        + F.col("turn_idx") * turn_gap_seconds
    )
    late_shift = F.when(
        (F.pmod(F.col("turn_idx"), late_every) == late_every - 1) & (F.col("turn_idx") > 0),
        F.lit(90),
    ).otherwise(F.lit(0))
    ts = F.timestamp_seconds(raw_ts - late_shift)

    return turns.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_convs: int = 200,
    avg_turns: int = 10,
    seed: int = 42,
    partitions: int | None = None,
    **kwargs,
) -> DataFrame:
    df = generate_transcripts(
        spark, n_convs=n_convs, avg_turns=avg_turns, seed=seed, partitions=partitions, **kwargs
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
