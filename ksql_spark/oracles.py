"""DuckDB oracle-SQL generators for the signature-based operators.

These produce ANSI-ish SQL that recomputes the exact same signatures as the
Spark operators in ``ksql_spark.operators.dedup`` / ``similarity`` — same
normalization, same shingling, same md5-derived 60-bit hash, same fold
order — so the driver's value-hash comparison passes bit-for-bit.

Each generator mirrors one Spark function; keep them in lockstep:
  sql_ngram_jaccard_pairs <-> dedup.ngram_jaccard_pairs
  sql_minhash_pairs       <-> dedup.minhash_lsh_pairs (semantic oracle:
                              LSH + exact verification == brute-force
                              exact Jaccard, given banding recall ~1 at the
                              configured threshold)
  sql_simhash_pairs       <-> dedup.simhash_pairs_blocked
  sql_embed_cosine_topk   <-> similarity.cosine_topk
  sql_embed_neardup       <-> dedup.embedding_neardup_pairs
"""

from __future__ import annotations

from .functions.text import SQL_NORMALIZE
from .functions.vectors import SQL_DOT, SQL_NORM

# shingle set of the normalized text, n-gram over words, distinct —
# mirrors dedup.word_shingles (docs shorter than n contribute one shingle)
def _sql_shingles(c: str, n: int) -> str:
    words = f"string_split({SQL_NORMALIZE.format(c=c)}, ' ')"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({words}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string({words}[i:i+{n - 1}], ' ')))"
    )


def _sql_jaccard(a: str, b: str) -> str:
    return (
        f"(CASE WHEN len(list_distinct(list_concat({a}, {b}))) > 0 "
        f"THEN len(list_intersect({a}, {b}))::double / "
        f"len(list_distinct(list_concat({a}, {b}))) ELSE 0.0 END)"
    )


def sql_ngram_jaccard_pairs(shingle_n: int = 3, threshold: float = 0.7) -> str:
    sh = _sql_shingles("text", shingle_n)
    return f"""
        WITH d AS (SELECT doc_id, {sh} AS sh FROM documents)
        SELECT l.doc_id AS id_l, r.doc_id AS id_r,
               (floor(({_sql_jaccard('l.sh', 'r.sh')}) * 1000000.0 + 0.5) / 1000000.0) AS jaccard_sim
        FROM d l JOIN d r ON l.doc_id < r.doc_id
        WHERE {_sql_jaccard('l.sh', 'r.sh')} >= {threshold}
    """


def sql_minhash_pairs(shingle_n: int = 3, threshold: float = 0.7) -> str:
    # semantic oracle: exact near-dup pairs.  The Spark side reaches the
    # same set via MinHash-LSH candidates + exact-Jaccard verification;
    # with r=3/b=16 banding, recall at the data's observed similarity
    # (>=0.9) is 1 - (1 - 0.729)^16 ~ 1 - 1e-9.
    return sql_ngram_jaccard_pairs(shingle_n=shingle_n, threshold=threshold)


def sql_minhash_pairs_incremental(
    shingle_n: int = 3, threshold: float = 0.7, delta_mod: int = 10
) -> str:
    """Oracle for dedup.minhash_lsh_pairs_incremental with the delta defined
    as doc_id % delta_mod == 0: brute-force exact-Jaccard pairs restricted to
    pairs touching >=1 delta doc — the exact subset the incremental path must
    reproduce (same semantic-oracle argument as sql_minhash_pairs)."""
    sh = _sql_shingles("text", shingle_n)
    return f"""
        WITH d AS (SELECT doc_id, {sh} AS sh FROM documents)
        SELECT l.doc_id AS id_l, r.doc_id AS id_r,
               (floor(({_sql_jaccard('l.sh', 'r.sh')}) * 1000000.0 + 0.5) / 1000000.0) AS jaccard_sim
        FROM d l JOIN d r ON l.doc_id < r.doc_id
        WHERE {_sql_jaccard('l.sh', 'r.sh')} >= {threshold}
          AND (l.doc_id % {delta_mod} = 0 OR r.doc_id % {delta_mod} = 0)
    """


def sql_simhash_pairs(bits: int = 32, max_hamming: int = 3) -> str:
    words = f"list_filter(string_split({SQL_NORMALIZE.format(c='text')}, ' '), w -> w != '')"
    hashes = f"list_transform({words}, s -> ('0x' || substr(md5(s), 1, 15))::bigint)"
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN (x >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
        WITH h AS (SELECT doc_id, {hashes} AS hs FROM documents),
             s AS (SELECT doc_id, ({bit_terms})::bigint AS sim FROM h)
        SELECT l.doc_id AS id_l, r.doc_id AS id_r,
               bit_count(xor(l.sim, r.sim))::int AS hamming_dist
        FROM s l JOIN s r ON l.doc_id < r.doc_id
        WHERE bit_count(xor(l.sim, r.sim)) <= {max_hamming}
    """


def _sql_cosine(a: str, b: str) -> str:
    d = f"({SQL_NORM.format(a=a)} * {SQL_NORM.format(a=b)})"
    return f"(CASE WHEN {d} > 0 THEN {SQL_DOT.format(a=a, b=b)} / {d} ELSE 0.0 END)"


def sql_embed_cosine_topk(k: int = 10) -> str:
    cos = _sql_cosine("e.embedding", "q.embedding")
    return f"""
        SELECT e.vec_id, (floor(({cos}) * 1000000.0 + 0.5) / 1000000.0) AS cosine_sim
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id != 0
        ORDER BY cosine_sim DESC, e.vec_id ASC LIMIT {k}
    """


def sql_embed_neardup(threshold: float = 0.9) -> str:
    cos = _sql_cosine("l.embedding", "r.embedding")
    return f"""
        SELECT l.vec_id AS id_l, r.vec_id AS id_r, (floor(({cos}) * 1000000.0 + 0.5) / 1000000.0) AS cosine_sim
        FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
        WHERE {cos} >= {threshold}
    """


# planted near-dup fixture: deterministic perturbed copies of every
# (vec_id % plant_mod == 0) vector — mirrors __spark_entry__._embeddings_planted
def sql_embeddings_planted_cte(
    n_dims: int = 64, plant_mod: int = 10, id_offset: int = 1000000
) -> str:
    idx = "[" + ", ".join(str(i) for i in range(n_dims)) + "]"
    return f"""(
        SELECT vec_id, list_transform(embedding, x -> x::double) AS embedding
        FROM embeddings
        UNION ALL
        SELECT vec_id + {id_offset} AS vec_id,
               list_transform(list_zip(embedding, {idx}),
                              p -> p[1]::double + ((p[2] % 5) - 2) * 0.004) AS embedding
        FROM embeddings WHERE vec_id % {plant_mod} = 0
    )"""


def sql_embed_neardup_planted(threshold: float = 0.99, n_dims: int = 64) -> str:
    """Brute-force oracle over the planted corpus.  The Spark side reaches
    the same set via banded hyperplane LSH + exact-cosine verification
    (dedup.embedding_neardup_pairs_lsh); at the planted similarity
    (cos ~ 0.999) banding recall is 1 - ~3e-8."""
    cos = _sql_cosine("l.embedding", "r.embedding")
    return f"""
        WITH emb AS {sql_embeddings_planted_cte(n_dims)}
        SELECT l.vec_id AS id_l, r.vec_id AS id_r, (floor(({cos}) * 1000000.0 + 0.5) / 1000000.0) AS cosine_sim
        FROM emb l JOIN emb r ON l.vec_id < r.vec_id
        WHERE {cos} >= {threshold}
    """


def _sql_plane_dot(vec: str, weights: list[float]) -> str:
    w = "[" + ", ".join(repr(x) for x in weights) + "]"
    return f"list_sum(list_transform(list_zip({vec}, {w}), p -> p[1]::double * p[2]))"


def sql_bucket_expr(vec: str, planes: list[list[float]]) -> str:
    """Packed sign-bit LSH bucket — bit-for-bit the Spark
    similarity.hyperplane_bucket (same md5-derived planes, same fold)."""
    terms = [
        f"(CASE WHEN {_sql_plane_dot(vec, w)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p, w in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")::bigint"


def sql_embed_lsh_ann(k: int = 10, n_planes: int = 8, n_dims: int = 64) -> str:
    """Full mirror of similarity.lsh_topk: identical buckets, identical
    multi-probe set (query bucket + all 1-bit flips), identical re-rank —
    so the approximate result rows themselves hash-compare."""
    from .operators.similarity import hyperplanes

    planes = hyperplanes(n_planes, n_dims)
    cos = _sql_cosine("b.embedding", "q.embedding")
    return f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
             qb AS (SELECT {sql_bucket_expr("embedding", planes)} AS bucket FROM q),
             b AS (SELECT vec_id, embedding,
                          {sql_bucket_expr("embedding", planes)} AS bucket
                   FROM embeddings WHERE vec_id != 0)
        SELECT b.vec_id, (floor(({cos}) * 1000000.0 + 0.5) / 1000000.0) AS cosine_sim
        FROM b, q, qb
        WHERE bit_count(xor(b.bucket, qb.bucket)) <= 1
        ORDER BY cosine_sim DESC, b.vec_id ASC LIMIT {k}
    """


def sql_dedup_clusters(shingle_n: int = 3, threshold: float = 0.7) -> str:
    """Oracle for dedup.dedup_clusters over minhash-LSH pairs: exact-Jaccard
    pairs (same set the LSH path verifies down to) fed into a recursive-CTE
    transitive closure; cluster = min reachable id, keep = is-representative.
    Mirrors dedup.connected_components (alternating star rounds) which
    computes the same min-label fixed point distributively."""
    sh = _sql_shingles("text", shingle_n)
    return f"""
        WITH RECURSIVE
        d AS (SELECT doc_id, {sh} AS sh FROM documents),
        p AS (SELECT l.doc_id AS u, r.doc_id AS v
              FROM d l JOIN d r ON l.doc_id < r.doc_id
              WHERE {_sql_jaccard('l.sh', 'r.sh')} >= {threshold}),
        e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
        reach AS (
            SELECT u AS id, v AS r FROM e
            UNION
            SELECT e.u AS id, w.r FROM e JOIN reach w ON w.id = e.v
        ),
        lab AS (SELECT id, least(id, min(r)) AS cluster FROM reach GROUP BY id)
        SELECT doc.doc_id,
               coalesce(lab.cluster, doc.doc_id) AS cluster_id,
               coalesce(lab.cluster, doc.doc_id) = doc.doc_id AS keep
        FROM documents doc LEFT JOIN lab ON doc.doc_id = lab.id
    """


def sql_embed_lsh_ann_batch(
    k: int = 10, n_planes: int = 8, n_dims: int = 64, query_mod: int = 20
) -> str:
    """Full mirror of similarity.lsh_topk_batch over the embeddings table
    with every ``query_mod``-th vector as a query: identical buckets,
    identical multi-probe set, identical per-query re-rank — the
    approximate rows themselves hash-compare, so any bucket-math drift
    fails the gate."""
    from .operators.similarity import hyperplanes

    planes = hyperplanes(n_planes, n_dims)
    probes = ", ".join(["qb"] + [f"xor(qb, {1 << p})" for p in range(n_planes)])
    cos = _sql_cosine("cv.embedding", "qv.embedding")
    return f"""
        WITH c AS (SELECT vec_id, {sql_bucket_expr("embedding", planes)} AS bucket
                   FROM embeddings WHERE vec_id % {query_mod} != 0),
             q AS (SELECT vec_id AS qid, {sql_bucket_expr("embedding", planes)} AS qb
                   FROM embeddings WHERE vec_id % {query_mod} = 0),
             probed AS (SELECT qid, unnest([{probes}]) AS bucket FROM q),
             cand AS (SELECT p.qid, c.vec_id FROM probed p JOIN c ON c.bucket = p.bucket),
             scored AS (
                 SELECT cand.qid, cand.vec_id, (floor(({cos}) * 1000000.0 + 0.5) / 1000000.0) AS cosine_sim
                 FROM cand
                 JOIN embeddings cv ON cv.vec_id = cand.vec_id
                 JOIN embeddings qv ON qv.vec_id = cand.qid),
             r AS (SELECT qid, vec_id, cosine_sim,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY cosine_sim DESC, vec_id ASC) AS rn
                   FROM scored)
        SELECT qid AS query_id, vec_id, cosine_sim, (rn - 1)::bigint AS rank
        FROM r WHERE rn <= {k}
    """


def sql_multimodal_decode(n: int = 64, seed: int = 42) -> str:
    """Oracle for the REAL multimodal codec path: recomputes the decoded
    pixel/sample statistics straight from the generative md5 byte formula
    (multimodal.synthesize_media_real), with no codec — if the Spark side's
    PNG/WAV/RVID decoding (operators/codecs.py) mangled any byte, the
    features would not match.  All features are exact-integer sums followed
    by fixed IEEE divisions, so float64 results are bit-identical."""
    return f"""
        WITH b AS (
            SELECT m.range AS i, j.range AS j,
                   ('0x' || substr(md5(concat({seed}, ':', m.range, ':', (j.range // 16))),
                                   ((j.range % 16) * 2 + 1)::int, 2))::bigint AS byte
            FROM range({n}) m, range(256) j
        ),
        img AS (
            SELECT i,
                   (floor(((sum(byte) / 192) / 255.0) * 1000000.0 + 0.5) / 1000000.0) AS f0,
                   (floor(((sum(CASE WHEN j % 3 = 0 THEN byte END) / 64) / 255.0) * 1000000.0 + 0.5) / 1000000.0) AS f1,
                   (floor(((sum(CASE WHEN j % 3 = 1 THEN byte END) / 64) / 255.0) * 1000000.0 + 0.5) / 1000000.0) AS f2,
                   (floor(((sum(CASE WHEN j % 3 = 2 THEN byte END) / 64) / 255.0) * 1000000.0 + 0.5) / 1000000.0) AS f3
            FROM b WHERE i % 3 = 0 AND j < 192 GROUP BY i
        ),
        aud_s AS (
            SELECT hi.i AS i, (hi.byte * 256 + lo.byte - 32768) AS v
            FROM b hi JOIN b lo ON hi.i = lo.i AND lo.j = hi.j + 1
            WHERE hi.i % 3 = 1 AND hi.j % 2 = 0
        ),
        aud AS (
            SELECT i,
                   (floor(((sum(v) / 128) / 32768.0) * 1000000.0 + 0.5) / 1000000.0) AS f0,
                   (floor((sqrt(sum(v * v) / 128) / 32768.0) * 1000000.0 + 0.5) / 1000000.0) AS f1,
                   (floor((max(abs(v)) / 32768.0) * 1000000.0 + 0.5) / 1000000.0) AS f2,
                   (floor((128 / 65536.0) * 1000000.0 + 0.5) / 1000000.0) AS f3
            FROM aud_s GROUP BY i
        ),
        vid AS (
            SELECT i,
                   (floor(((sum(byte) / 192) / 255.0) * 1000000.0 + 0.5) / 1000000.0) AS f0,
                   (floor((4 / 256.0) * 1000000.0 + 0.5) / 1000000.0) AS f1,
                   (floor((4 / 4096.0) * 1000000.0 + 0.5) / 1000000.0) AS f2,
                   (floor((4 / 4096.0) * 1000000.0 + 0.5) / 1000000.0) AS f3
            FROM b WHERE i % 3 = 2 AND j < 192 GROUP BY i
        ),
        allr AS (
            SELECT i, 'image' AS kind, f0, f1, f2, f3 FROM img
            UNION ALL SELECT i, 'audio', f0, f1, f2, f3 FROM aud
            UNION ALL SELECT i, 'video', f0, f1, f2, f3 FROM vid
        )
        SELECT i AS media_id, kind, f0, f1, f2, f3 FROM allr
    """
