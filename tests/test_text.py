"""Text-analysis functions: deterministic values + DuckDB-twin agreement."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as Fn

from ksql_spark.functions.text import (
    SQL_TOKEN_BPE,
    SQL_TOKEN_WS,
    fingerprint,
    lang_id,
    portable_hash60,
    quality_score,
    sql_fingerprint,
    sql_lang_id,
    sql_quality_score,
    token_count_bpe,
    token_count_ws,
)

DOCS = [
    (1, "The cat sat on the mat and it was happy."),
    (2, "Der Hund ist nicht mit der Katze auf das Sofa."),
    (3, "Le chat est dans la maison et les oiseaux dans le jardin pour que."),
    (4, "El perro es un animal y la casa es de los gatos en madrid."),
    (5, "zxcvb qwerty 12345 !!!"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts(spark, docs):
    rows = {
        r.doc_id: (r.ws, r.bpe)
        for r in docs.select(
            "doc_id",
            token_count_ws(Fn.col("text")).alias("ws"),
            token_count_bpe(Fn.col("text")).alias("bpe"),
        ).collect()
    }
    assert rows[1] == (10, 11)  # 10 words + trailing period as its own BPE token
    assert rows[6] == (0, 0)


def test_lang_id_profiles(spark, docs):
    rows = {r.doc_id: r.lang for r in docs.select("doc_id", lang_id(Fn.col("text")).alias("lang")).collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "fr"
    assert rows[4] == "es"
    assert rows[5] == "und"
    assert rows[6] == "und"


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO ... world")],
        "doc_id long, text string",
    )
    fps = [r.fp for r in df.select(fingerprint(Fn.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_quality_score_bounds(spark, docs):
    rows = docs.select(quality_score(Fn.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_portable_hash_matches_duckdb(spark):
    samples = ["hello", "spark streaming", "", "conv000042 turn 7"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    spark_vals = [r.h for r in df.select(portable_hash60(Fn.col("s")).alias("h")).collect()]
    duck_vals = [
        duckdb.sql(f"select ('0x' || substr(md5('{s}'), 1, 15))::bigint").fetchone()[0]
        for s in samples
    ]
    assert spark_vals == duck_vals


def test_sql_twins_agree(spark, docs):
    """The DuckDB oracle twins must reproduce the Spark values exactly."""
    pdf = docs.select(
        "doc_id",
        token_count_ws(Fn.col("text")).alias("tok_ws"),
        token_count_bpe(Fn.col("text")).alias("tok_bpe"),
        lang_id(Fn.col("text")).alias("lang"),
        Fn.round(quality_score(Fn.col("text")), 6).alias("q"),
        fingerprint(Fn.col("text")).alias("fp"),
    ).toPandas()

    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(DOCS, columns=["doc_id", "text"]))
    sql = f"""
        SELECT doc_id, {SQL_TOKEN_WS.format(c='text')} AS tok_ws,
               {SQL_TOKEN_BPE.format(c='text')} AS tok_bpe,
               {sql_lang_id('text')} AS lang,
               round({sql_quality_score('text')}, 6) AS q,
               {sql_fingerprint('text')} AS fp
        FROM docs ORDER BY doc_id
    """
    ddf = con.execute(sql).df()
    spdf = pdf.sort_values("doc_id").reset_index(drop=True)
    for col in ["tok_ws", "tok_bpe", "lang", "q", "fp"]:
        assert list(spdf[col]) == list(ddf[col]), col


def test_null_text_semantics(spark):
    """NULL text propagates as NULL through every text function (ADVICE r2:
    concat_ws would otherwise normalize NULL to '' and merge NULL-text docs
    with empty-text docs in exact_dedup), matching the DuckDB twins."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "The cat.")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            token_count_ws(Fn.col("text")).alias("ws"),
            token_count_bpe(Fn.col("text")).alias("bpe"),
            lang_id(Fn.col("text")).alias("lang"),
            quality_score(Fn.col("text")).alias("q"),
            fingerprint(Fn.col("text")).alias("fp"),
        ).collect()
    }
    assert (out[1].ws, out[1].bpe, out[1].lang, out[1].q, out[1].fp) == (
        None, None, None, None, None,
    )
    assert out[2].ws == 0 and out[2].fp is not None
    assert out[2].fp != out[1].fp  # NULL text and empty text do NOT merge

    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES (1, NULL), (2, ''), (3, 'The cat.')) t(doc_id, text)")
    oracle = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT doc_id, {SQL_TOKEN_WS.format(c='text')}, {SQL_TOKEN_BPE.format(c='text')}, "
            f"{sql_lang_id('text')}, {sql_quality_score('text')}, {sql_fingerprint('text')} FROM d"
        ).fetchall()
    }
    for doc_id, r in out.items():
        o = oracle[doc_id]
        assert (r.ws, r.bpe, r.lang) == (o[0], o[1], o[2]), doc_id
        if r.q is None:
            assert o[3] is None
        else:
            assert abs(r.q - o[3]) < 1e-9
        assert r.fp == o[4], doc_id
