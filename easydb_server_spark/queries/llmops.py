"""Conformance wrappers for the LLM-data-pipeline operators
(dedup / similarity / text analysis / multimodal plumbing).

Each wraps an operator from easydb_server_spark/operators/ and pairs
it with a DuckDB oracle that replays the *same* deterministic
md5-derived hash arithmetic in ANSI SQL, so even MinHash/SimHash get
exact value-hash checks rather than rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.functions.exactround import round_div_sql, round_ratio
from easydb_server_spark.operators import dedup as D
from easydb_server_spark.operators import similarity as S
from easydb_server_spark.operators import text as T
from easydb_server_spark.operators.multimodal import (
    binary_features,
    documents_as_binary,
    resize_images,
    sample_frames,
)
from easydb_server_spark.queries._util import load, spread

# ---------- shared SQL fragments (mirror operators/dedup.py) ----------

_SHINGLES_CTE = """
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh_all AS (
  SELECT w.doc_id, array_to_string(w.ws[t.i + 1 : t.i + 3], ' ') AS shingle
  FROM words w, UNNEST(generate_series(0, greatest(len(w.ws) - 3, 0))) t(i)
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh_all),
hashed AS (
  SELECT doc_id, shingle,
         CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0
  FROM sh
)
"""


def _params_values() -> str:
    return ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(D._hash_params()))


# ---------- dedup ----------


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    dups = d.where(F.col("doc_id") < 50).select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    return d.select("doc_id", "text").unionAll(dups)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a dup-injected corpus (md5 groupBy)."""
    out = D.exact_dedup(_docs_with_dups(spark, sf_dir), "text", "doc_id")
    return out.orderBy("content_hash")


ORACLE_DEDUP_EXACT = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50
)
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM corpus
GROUP BY md5(text)
ORDER BY content_hash
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (doc_id, i, minhash) — exact oracle via the
    same universal-hash family."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return D.minhash_signatures(d, "text", "doc_id").orderBy("doc_id", "i")


ORACLE_DEDUP_MINHASH = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM docs),
sh_all AS (
  SELECT w.doc_id, array_to_string(w.ws[t.i + 1 : t.i + 3], ' ') AS shingle
  FROM words w, UNNEST(generate_series(0, greatest(len(w.ws) - 3, 0))) t(i)
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh_all),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0 FROM sh
),
params(i, a, b) AS (VALUES {_params_values()})
SELECT h.doc_id, p.i, MIN((p.a * h.h0 + p.b) % {D.MINHASH_P}) AS minhash
FROM hashed h CROSS JOIN params p
GROUP BY h.doc_id, p.i
ORDER BY doc_id, i
"""


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs over a dup-injected corpus.

    The oracle replays the whole pipeline — universal-hash family,
    banding, candidate restriction, exact Jaccard via list_intersect —
    so this is a full value-hash check of the flagship dedup operator,
    not just its signature stage."""
    d = _docs_with_dups(spark, sf_dir)
    d = d.where(F.col("doc_id") % 10000 < 300)
    return D.minhash_pairs(d, "text", "doc_id", threshold=0.5).orderBy("doc_a", "doc_b")


ORACLE_DEDUP_MINHASH_PAIRS = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10000 < 300
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50 AND doc_id % 10000 < 300
),
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM docs),
sh_all AS (
  SELECT w.doc_id, array_to_string(w.ws[t.i + 1 : t.i + 3], ' ') AS shingle
  FROM words w, UNNEST(generate_series(0, greatest(len(w.ws) - 3, 0))) t(i)
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh_all),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0 FROM sh
),
params(i, a, b) AS (VALUES {{params}}),
sigs AS (
  SELECT h.doc_id, p.i, MIN((p.a * h.h0 + p.b) % {D.MINHASH_P}) AS minhash
  FROM hashed h CROSS JOIN params p
  GROUP BY h.doc_id, p.i
),
bands AS (
  SELECT doc_id, CAST(i // {D.MINHASH_N // D.MINHASH_BANDS} AS INT) AS band,
         md5(array_to_string(list_sort(list(printf('%d:%d', i, minhash))), ',')) AS band_hash
  FROM sigs GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
),
arrs AS (SELECT doc_id, list(shingle) AS shingles FROM sh GROUP BY doc_id),
scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(a.shingles, b.shingles)) AS n_inter,
         len(a.shingles) AS sh_a, len(b.shingles) AS sh_b
  FROM cand c
  JOIN arrs a ON a.doc_id = c.doc_a
  JOIN arrs b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       (CAST((CASE WHEN (n_inter) < 0 THEN -(((((abs(CAST(n_inter AS BIGINT)) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) >= (CAST(sh_a + sh_b - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_inter AS BIGINT)) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) >= (CAST(sh_a + sh_b - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS jaccard
FROM scored
WHERE (CAST((CASE WHEN (n_inter) < 0 THEN -(((((abs(CAST(n_inter AS BIGINT)) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) >= (CAST(sh_a + sh_b - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_inter AS BIGINT)) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) // (CAST(sh_a + sh_b - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) * 100) % (CAST(sh_a + sh_b - n_inter AS BIGINT))) >= (CAST(sh_a + sh_b - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) >= 0.5
ORDER BY doc_a, doc_b
""".replace("{params}", _params_values())


# hot-shingle document-frequency cap used by every ngram-Jaccard
# conformance query; the oracles replay it with HAVING COUNT(*) <= cap
NGRAM_MAX_DF = 64

# shared capped-inverted-index SQL: postings with df > cap are dropped
# before pair expansion (mirrors ngram_jaccard_pairs max_doc_freq);
# sizes stay uncapped — only the intersection is df-restricted
_NGRAM_INTER_CTES = f"""
h60 AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h FROM sh
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM h60 GROUP BY doc_id),
keep AS (SELECT h FROM h60 GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {NGRAM_MAX_DF}),
inter AS (
  SELECT p.doc_id AS doc_a, q.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM h60 p JOIN keep kk ON kk.h = p.h
  JOIN h60 q ON p.h = q.h AND p.doc_id < q.doc_id
  GROUP BY p.doc_id, q.doc_id
)"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index,
    hot shingles capped at df <= NGRAM_MAX_DF (oracle replays the cap)."""
    d = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        d, "text", "doc_id", threshold=0.4, max_doc_freq=NGRAM_MAX_DF
    ).orderBy("doc_a", "doc_b")


ORACLE_DEDUP_NGRAM_JACCARD = f"""
WITH {_SHINGLES_CTE},
{_NGRAM_INTER_CTES}
SELECT doc_a, doc_b,
       (CAST((CASE WHEN (n_inter) < 0 THEN -(((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE (CAST((CASE WHEN (n_inter) < 0 THEN -(((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) >= 0.4
ORDER BY doc_a, doc_b
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures per doc (16-bit, portable bit arithmetic)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return D.simhash_signatures(d, "text", "doc_id").orderBy("doc_id")


ORACLE_DEDUP_SIMHASH = """
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
w AS (
  SELECT doc_id, CAST(('0x' || substr(md5(t.word), 1, 8)) AS BIGINT) AS h0
  FROM docs, UNNEST(string_split(text, ' ')) t(word)
),
contrib AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h0 >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM w CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS simhash
FROM contrib GROUP BY doc_id ORDER BY doc_id
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-LSH near-dup pairs over a dup-injected corpus;
    the oracle replays signatures, chunk banding, and the XOR-popcount
    verification."""
    d = _docs_with_dups(spark, sf_dir)
    d = d.where(F.col("doc_id") % 10000 < 200)
    out = D.simhash_pairs(d, "text", "doc_id", bits=32, max_hamming=3)
    return out.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("doc_a", "doc_b")


ORACLE_DEDUP_SIMHASH_PAIRS = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10000 < 200
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50 AND doc_id % 10000 < 200
),
w AS (
  SELECT doc_id, CAST(('0x' || substr(md5(t.word), 1, 8)) AS BIGINT) AS h0
  FROM docs, UNNEST(string_split(text, ' ')) t(word)
),
contrib AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h0 >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM w CROSS JOIN (SELECT UNNEST(generate_series(0, 31)) AS bit) b
  GROUP BY doc_id, b.bit
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
  FROM contrib GROUP BY doc_id
),
banded AS (
  SELECT doc_id, simhash, b.b, (simhash >> (b.b * 8)) & 255 AS bv
  FROM sig CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS b) b
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                  x.simhash AS sa, y.simhash AS sb
  FROM banded x
  JOIN banded y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= 3
ORDER BY doc_a, doc_b
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute-force correctness path)."""
    e = load(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs(e, "embedding", "vec_id", threshold=0.42).orderBy("id_a", "id_b")


ORACLE_DEDUP_EMBEDDING_COSINE = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       ROUND(list_cosine_similarity(x.vec, y.vec), 6) AS cosine
FROM v x JOIN v y ON x.vec_id < y.vec_id
WHERE ROUND(list_cosine_similarity(x.vec, y.vec), 6) >= 0.42
ORDER BY id_a, id_b
"""


# ---------- similarity search ----------


def q_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the first 5 vectors as queries."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return S.topk_cosine_bruteforce(e, q, "embedding", "vec_id", k=5).orderBy("qid", "rank")


ORACLE_SIM_TOPK_BRUTEFORCE = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         ROUND(list_cosine_similarity(c.vec, q.vec), 6) AS cosine
  FROM v c CROSS JOIN q WHERE c.vec_id != q.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
  FROM scored
)
SELECT qid, cid, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
ORDER BY qid, rank
"""


def q_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH-bucketed ANN top-3 (scale path, probes=2) —
    exact oracle replays the same deterministic hyperplanes AND the
    same probe set (base bucket + 2 smallest-margin bit flips)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    return S.topk_cosine_lsh(e, q, "embedding", "vec_id", k=3, probes=2).orderBy("qid", "rank")


def _oracle_sim_topk_lsh(probes: int = 2) -> str:
    planes = S.lsh_planes(64)
    plane_lits = ", ".join("[" + ", ".join(repr(v) for v in row) + "]" for row in planes)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
planes AS (
  SELECT UNNEST(range(0, {S.LSH_PLANES})) AS i,
         UNNEST([{plane_lits}]) AS plane
),
dots AS (
  SELECT v.vec_id, p.i, list_dot_product(v.vec, p.plane) AS d
  FROM v CROSS JOIN planes p
),
sigs AS (
  SELECT v.vec_id, v.vec,
         (SELECT CAST(SUM(CASE WHEN d.d >= 0 THEN 1 << d.i ELSE 0 END) AS BIGINT)
          FROM dots d WHERE d.vec_id = v.vec_id) AS bucket
  FROM v
),
-- multi-probe flip bits: the {probes} planes with the smallest
-- |dot| margin (rounded to 6 dp, plane-index tiebreak) — mirrors
-- operators/similarity.py:_sig_norm_probes_udf exactly
qflips AS (
  SELECT vec_id, i,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY ROUND(ABS(d), 6) ASC, i ASC) AS rn
  FROM dots WHERE vec_id < 10
),
qprobes AS (
  SELECT s.vec_id, s.vec, s.bucket AS probe FROM sigs s WHERE s.vec_id < 10
  UNION ALL
  SELECT s.vec_id, s.vec, CAST(xor(s.bucket, CAST(1 << f.i AS BIGINT)) AS BIGINT) AS probe
  FROM sigs s JOIN qflips f USING (vec_id)
  WHERE f.rn <= {probes} AND s.vec_id < 10
),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         ROUND(list_cosine_similarity(c.vec, q.vec), 6) AS cosine
  FROM sigs c JOIN qprobes q ON c.bucket = q.probe AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
  FROM scored
)
SELECT qid, cid, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 3
ORDER BY qid, rank
"""


ORACLE_SIM_TOPK_LSH = _oracle_sim_topk_lsh()


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs over a dup-injected vector
    corpus (exact copies share a bucket by construction, so recall on
    true dups is 1.0); oracle replays the deterministic hyperplanes."""
    e = load(spark, sf_dir, "embeddings")
    dups = e.where(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = e.select("vec_id", "embedding").unionAll(dups)
    return S.neardup_pairs_lsh(corpus, "embedding", "vec_id", threshold=0.9).orderBy(
        "id_a", "id_b"
    )


def _oracle_dedup_embedding_lsh() -> str:
    planes = S.lsh_planes(64)
    plane_lits = ", ".join("[" + ", ".join(repr(v) for v in row) + "]" for row in planes)
    return f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
v AS (
  SELECT vec_id, vec FROM base
  UNION ALL
  SELECT vec_id + 10000, vec FROM base WHERE vec_id < 30
),
planes AS (
  SELECT UNNEST(range(0, {S.LSH_PLANES})) AS i,
         UNNEST([{plane_lits}]) AS plane
),
sigs AS (
  SELECT v.vec_id, v.vec,
         CAST(SUM(CASE WHEN list_dot_product(v.vec, p.plane) >= 0
                       THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes p
  GROUP BY v.vec_id, v.vec
)
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       ROUND(list_cosine_similarity(x.vec, y.vec), 6) AS cosine
FROM sigs x JOIN sigs y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE ROUND(list_cosine_similarity(x.vec, y.vec), 6) >= 0.9
ORDER BY id_a, id_b
"""


ORACLE_DEDUP_EMBEDDING_LSH = _oracle_dedup_embedding_lsh()


def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-3 (nprobe=2 over 16 training-free cells;
    pinned explicitly — the oracle replays LIMIT 16 — so the auto
    n_cells policy can evolve without touching conformance)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 30))
    return S.topk_cosine_ivf(e, q, "embedding", "vec_id", k=3, n_cells=16).orderBy(
        "qid", "rank"
    )


ORACLE_SIM_TOPK_IVF = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
init AS (
  SELECT vec_id AS cell, vec AS centroid FROM v
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
a0 AS (
  SELECT cid, cell FROM (
    SELECT v.vec_id AS cid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_dot_product(v.vec, c.centroid), 6) DESC, c.cell) AS r
    FROM v CROSS JOIN init c
  ) WHERE r = 1
),
upd AS (
  SELECT a0.cell, t.i AS pos, ROUND(AVG(v.vec[t.i]), 5) AS m
  FROM a0 JOIN v ON v.vec_id = a0.cid,
       UNNEST(generate_series(1, len(v.vec))) t(i)
  GROUP BY a0.cell, t.i
),
newc AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM upd GROUP BY cell),
cents AS (
  SELECT i.cell, COALESCE(n.centroid, i.centroid) AS centroid
  FROM init i LEFT JOIN newc n ON n.cell = i.cell
),
assigned AS (
  SELECT cid, cell FROM (
    SELECT v.vec_id AS cid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_dot_product(v.vec, c.centroid), 6) DESC, c.cell) AS r
    FROM v CROSS JOIN cents c
  ) WHERE r = 1
),
probed AS (
  SELECT qid, cell FROM (
    SELECT v.vec_id AS qid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_dot_product(v.vec, c.centroid), 6) DESC, c.cell) AS r
    FROM v CROSS JOIN cents c
    WHERE v.vec_id >= 20 AND v.vec_id < 30
  ) WHERE r <= 2
),
scored AS (
  SELECT DISTINCT p.qid, a.cid,
         ROUND(list_cosine_similarity(cv.vec, qv.vec), 6) AS cosine
  FROM probed p
  JOIN assigned a ON a.cell = p.cell
  JOIN v cv ON cv.vec_id = a.cid
  JOIN v qv ON qv.vec_id = p.qid
  WHERE a.cid != p.qid
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
  FROM scored
)
SELECT qid, cid, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 3
ORDER BY qid, rank
"""


def q_sim_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding near-dup: vec_id < 80 is the indexed
    corpus (16 IVF cells, deterministic k-means); the new batch is
    vec_id 80-99 (novel) + 10 exact copies of corpus vectors (+1000)
    + 20 one-coordinate perturbations (+2000, first dim +0.2).
    Pairs at cosine ≥ 0.95 within the nprobe=2 probed cells — the
    oracle replays the centroid derivation, the probe restriction,
    and the cosine threshold, so recall artifacts of the cell
    geometry match bit-for-bit (IVF semantics, not ground truth).
    Uses the side-effect-free probe core shared with the persisted
    store (operators/similarity.py:embedding_neardup_probe)."""
    from easydb_server_spark.operators.similarity import (
        _as_double,
        _assign_cells,
        embedding_neardup_probe,
        ivf_centroids,
    )

    e = load(spark, sf_dir, "embeddings")
    emb = _as_double(F.col("embedding"))
    corpus = e.where(F.col("vec_id") < 80).select("vec_id", "embedding")
    near = e.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 30)).select(
        (F.col("vec_id") + 2000).alias("qid"),
        F.concat(F.array(F.element_at(emb, 1) + F.lit(0.2)), F.slice(emb, 2, 63)).alias("qvec"),
    )
    batch = (
        e.where((F.col("vec_id") >= 80) & (F.col("vec_id") < 100))
        .select(F.col("vec_id").alias("qid"), emb.alias("qvec"))
        .unionAll(
            e.where(F.col("vec_id") < 10).select(
                (F.col("vec_id") + 1000).alias("qid"), emb.alias("qvec")
            )
        )
        .unionAll(near)
    )
    cents = ivf_centroids(corpus, "embedding", "vec_id", n_cells=16)
    store = _assign_cells(
        corpus.select(F.col("vec_id").alias("cid"), emb.alias("cvec")), cents
    )
    return embedding_neardup_probe(store, cents, batch, threshold=0.95, nprobe=2).orderBy(
        "batch_id", "corpus_id"
    )


ORACLE_SIM_INCREMENTAL_NEARDUP = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
corpus AS (SELECT vec_id, vec FROM v WHERE vec_id < 80),
init AS (
  SELECT vec_id AS cell, vec AS centroid FROM corpus
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
a0 AS (
  SELECT cid, cell FROM (
    SELECT c0.vec_id AS cid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY c0.vec_id
                              ORDER BY ROUND(list_dot_product(c0.vec, c.centroid), 6) DESC, c.cell) AS r
    FROM corpus c0 CROSS JOIN init c
  ) WHERE r = 1
),
upd AS (
  SELECT a0.cell, t.i AS pos, ROUND(AVG(c0.vec[t.i]), 5) AS m
  FROM a0 JOIN corpus c0 ON c0.vec_id = a0.cid,
       UNNEST(generate_series(1, len(c0.vec))) t(i)
  GROUP BY a0.cell, t.i
),
newc AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM upd GROUP BY cell),
cents AS (
  SELECT i.cell, COALESCE(n.centroid, i.centroid) AS centroid
  FROM init i LEFT JOIN newc n ON n.cell = i.cell
),
assigned AS (
  SELECT cid, cell FROM (
    SELECT c0.vec_id AS cid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY c0.vec_id
                              ORDER BY ROUND(list_dot_product(c0.vec, c.centroid), 6) DESC, c.cell) AS r
    FROM corpus c0 CROSS JOIN cents c
  ) WHERE r = 1
),
batch AS (
  SELECT vec_id AS qid, vec FROM v WHERE vec_id >= 80 AND vec_id < 100
  UNION ALL
  SELECT vec_id + 1000, vec FROM v WHERE vec_id < 10
  UNION ALL
  SELECT vec_id + 2000, list_prepend(vec[1] + 0.2, vec[2:]) FROM v
  WHERE vec_id >= 10 AND vec_id < 30
),
probed AS (
  SELECT qid, cell FROM (
    SELECT b.qid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.qid
                              ORDER BY ROUND(list_dot_product(b.vec, c.centroid), 6) DESC, c.cell) AS r
    FROM batch b CROSS JOIN cents c
  ) WHERE r <= 2
)
SELECT DISTINCT p.qid AS batch_id, a.cid AS corpus_id,
       ROUND(list_cosine_similarity(cv.vec, qv.vec), 6) AS cosine
FROM probed p
JOIN assigned a ON a.cell = p.cell
JOIN corpus cv ON cv.vec_id = a.cid
JOIN batch qv ON qv.qid = p.qid
WHERE ROUND(list_cosine_similarity(cv.vec, qv.vec), 6) >= 0.95
ORDER BY batch_id, corpus_id
"""


def q_dedup_pipeline_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production dedup flow in one plan: near-dup pairs
    (exact Jaccard @0.6) → connected components → keeper = min doc_id
    per component → corpus minus non-keepers. Returns the surviving
    doc ids with their component tag (docs in no component survive as
    their own keeper)."""
    from easydb_server_spark.operators.clusters import connected_components

    d = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.6, max_doc_freq=NGRAM_MAX_DF)
    cc = connected_components(pairs)
    keepers = cc.groupBy("component").agg(F.min("doc_id").alias("keeper"))
    drops = cc.join(keepers, "component").where(F.col("doc_id") != F.col("keeper")).select("doc_id")
    return (
        d.join(drops, "doc_id", "left_anti")
        .join(cc, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("component"))
        .orderBy("doc_id")
    )


ORACLE_DEDUP_PIPELINE_KEEPERS = f"""
WITH RECURSIVE {_SHINGLES_CTE},
{_NGRAM_INTER_CTES},
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE (CAST((CASE WHEN (n_inter) < 0 THEN -(((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) >= 0.6
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
),
keepers AS (SELECT component, MIN(doc_id) AS keeper FROM labels GROUP BY component),
drops AS (
  SELECT l.doc_id FROM labels l JOIN keepers k ON l.component = k.component
  WHERE l.doc_id != k.keeper
)
SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS component
FROM documents d
LEFT JOIN labels l ON l.doc_id = d.doc_id
WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
ORDER BY d.doc_id
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components (iterative min-label
    propagation) → cluster summaries; oracle = recursive-CTE
    transitive closure over the same pair list."""
    from easydb_server_spark.operators.clusters import dedup_clusters

    d = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.4, max_doc_freq=NGRAM_MAX_DF)
    return dedup_clusters(pairs).orderBy("component")


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SHINGLES_CTE},
{_NGRAM_INTER_CTES},
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE (CAST((CASE WHEN (n_inter) < 0 THEN -(((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) >= 0.4
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
)
SELECT component,
       COUNT(*) AS n_members,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members_csv
FROM labels
GROUP BY component
ORDER BY component
"""


# ---------- text analysis ----------


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return T.language_id(d, "text", "doc_id").orderBy("doc_id")


def _oracle_langid() -> str:
    langs = sorted(T.LANG_PROFILES)
    hit_exprs = ",\n       ".join(
        "CAST(len(list_filter(ws, w -> list_contains(["
        + ", ".join(f"'{w}'" for w in T.LANG_PROFILES[lg])
        + f"], w))) AS INT) AS hits_{lg}"
        for lg in langs
    )
    best = "GREATEST(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    pred_chain = "CASE "
    for lg in langs:
        pred_chain += f"WHEN hits_{lg} = {best} THEN '{lg}' "
    pred_chain += "END"
    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
hits AS (
  SELECT doc_id,
       {hit_exprs}
  FROM words
)
SELECT doc_id,
       CASE WHEN {best} > 0 THEN {pred_chain} ELSE 'unknown' END AS pred_lang,
       {', '.join('hits_' + lg for lg in langs)}
FROM hits ORDER BY doc_id
"""


ORACLE_TEXT_LANGID = _oracle_langid()


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return T.quality_score(d, "text", "doc_id").orderBy("doc_id")


ORACLE_TEXT_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS INT) AS n_punct
  FROM documents
),
t2 AS (
  SELECT *, CAST(len(list_filter(ws, w -> list_contains([{", ".join(repr(w) for w in T.LANG_PROFILES["en"])}], w))) AS INT) AS n_stopwords
  FROM t
)
SELECT doc_id, n_chars, n_words, n_punct, n_stopwords,
       (CAST((CASE WHEN (qnum) < 0 THEN -(((((abs(CAST(qnum AS BIGINT)) // (CAST(qden AS BIGINT))) * 100 + ((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) >= (CAST(qden AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(qnum AS BIGINT)) // (CAST(qden AS BIGINT))) * 100 + ((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) >= (CAST(qden AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS quality
FROM (SELECT *, CAST(n_words AS BIGINT) * GREATEST(n_words, 1) * GREATEST(n_chars, 1) + 800 * CAST(n_stopwords AS BIGINT) * GREATEST(n_chars, 1) - 2000 * CAST(n_punct AS BIGINT) * GREATEST(n_words, 1) AS qnum, 400 * CAST(GREATEST(n_words, 1) AS BIGINT) * GREATEST(n_chars, 1) AS qden FROM t2)
ORDER BY doc_id
"""


def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return T.token_counts(d, "text", "doc_id").orderBy("doc_id")


ORACLE_TEXT_TOKEN_COUNTS = f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, ' +')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{T.BPE_ISH_TOKEN_RE}')) AS INT) AS bpe_tokens,
       CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS INT) AS distinct_tokens,
       (CAST((CASE WHEN (len(list_distinct(regexp_split_to_array(text, ' +')))) < 0 THEN -(((((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) // (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100 + ((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) // (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100 + ((((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) // (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100 + ((((((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) // (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) >= (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) // (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100 + ((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) // (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100 + ((((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) // (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100 + ((((((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) // (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(len(list_distinct(regexp_split_to_array(text, ' +'))) AS BIGINT)) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) * 100) % (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT))) >= (CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS type_token_ratio
FROM documents ORDER BY doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return T.fingerprint(d, "text", "doc_id").orderBy("doc_id")


ORACLE_TEXT_FINGERPRINT = f"""
WITH {_SHINGLES_CTE}
SELECT doc_id, MIN(h0) AS fp_min, MAX(h0) AS fp_max, COUNT(*) AS n_shingles
FROM hashed GROUP BY doc_id ORDER BY doc_id
"""


# ---------- multimodal plumbing ----------


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through the real mapInPandas
    pipeline (decode stubbed deterministically)."""
    d = load(spark, sf_dir, "documents")
    return binary_features(documents_as_binary(d, "text", "doc_id"), "payload", "item_id", "kind").orderBy(
        "item_id"
    )


ORACLE_MULTIMODAL_FEATURES = """
SELECT doc_id AS item_id,
       CAST(strlen(text) AS INT)            AS n_bytes,
       md5(text)                            AS digest,
       'image'                              AS kind,
       CAST(strlen(text) % 640 AS INT)      AS width,
       CAST((strlen(text) * 7) % 480 AS INT) AS height
FROM documents ORDER BY doc_id
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline through the real mapInPandas plumbing (stubbed
    pixel work: payload cycled to width*height bytes). Conformance
    projects md5(payload) so the byte-exact output is value-checked.
    The corpus is ASCII, so the DuckDB oracle replays the truncate/pad
    with string repeat+substr."""
    d = load(spark, sf_dir, "documents")
    resized = resize_images(documents_as_binary(d, "text", "doc_id"), "payload", "item_id", 8, 8)
    return resized.select(
        "item_id",
        "width",
        "height",
        F.md5(F.col("payload")).alias("payload_md5"),
        F.length(F.col("payload")).alias("n_bytes"),
    ).orderBy("item_id")


ORACLE_MULTIMODAL_RESIZE = """
SELECT doc_id                                            AS item_id,
       CAST(8 AS INT)                                    AS width,
       CAST(8 AS INT)                                    AS height,
       md5(substr(repeat(text, 64 // strlen(text) + 1), 1, 64)) AS payload_md5,
       CAST(64 AS INT)                                   AS n_bytes
FROM documents ORDER BY doc_id
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1 blob -> 4 frame rows) through
    mapInPandas; stub frames are equal-width byte slices, so the
    oracle replays the slicing with substr over the ASCII corpus."""
    d = load(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_binary(d, "text", "doc_id"), "payload", "item_id", 4)
    return frames.select(
        "item_id",
        "frame_idx",
        F.md5(F.col("frame")).alias("frame_md5"),
        F.length(F.col("frame")).alias("frame_bytes"),
    ).orderBy("item_id", "frame_idx")


ORACLE_MULTIMODAL_FRAMES = """
SELECT d.doc_id                                          AS item_id,
       CAST(t.i AS INT)                                  AS frame_idx,
       md5(substr(d.text, CAST(t.i * (strlen(d.text) // 4) + 1 AS INT),
                  CAST(strlen(d.text) // 4 AS INT)))     AS frame_md5,
       CAST(strlen(d.text) // 4 AS INT)                  AS frame_bytes
FROM documents d, range(0, 4) t(i)
ORDER BY item_id, frame_idx
"""


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features through a REAL WAV codec end-to-end: each doc_id
    becomes a deterministic 16-bit PCM clip (sawtooth-ish samples
    ``((doc_id·7919 + i·104729) mod 65536) − 32768``, 8 kHz mono,
    100 + doc_id % 50 frames) ENCODED to genuine RIFF/WAVE bytes in an
    Arrow-batched stage, then decoded back and featurized by
    ``multimodal.audio_features`` (pure-stdlib
    :mod:`easydb_server_spark.operators.wav`). The oracle never sees
    the bytes — it computes the same features in closed form from the
    sample recipe, so a hash match proves the encode→decode→feature
    path is byte-faithful. All sums are exact in int64/float64
    (integer samples, < 2⁵³), so both engines agree bit-for-bit.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import encode_wav

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 100 + did % 50
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)
                out.append((did, encode_wav(s, 8000)))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    blobs = d.mapInPandas(build, "item_id bigint, payload binary")
    from easydb_server_spark.operators.multimodal import audio_features

    return (
        audio_features(blobs, "payload", "item_id")
        .select(
            "item_id",
            "sample_rate",
            "n_channels",
            "n_samples",
            "duration_ms",
            "rms",
            "clipping_frac",
            "peak",
        )
        .orderBy("item_id")
    )


ORACLE_MULTIMODAL_AUDIO = """
WITH nn AS (SELECT doc_id, 100 + doc_id % 50 AS n FROM documents),
s AS (
  SELECT nn.doc_id, nn.n,
         ((nn.doc_id * 7919 + t.i * 104729) % 65536) - 32768 AS s
  FROM nn, UNNEST(generate_series(0, nn.n - 1)) t(i)
)
SELECT doc_id                                            AS item_id,
       CAST(8000 AS INT)                                 AS sample_rate,
       CAST(1 AS INT)                                    AS n_channels,
       CAST(MAX(n) AS INT)                               AS n_samples,
       CAST(FLOOR(MAX(n) * 1000.0 / 8000) AS INT)        AS duration_ms,
       ROUND(SQRT(CAST(SUM(s * s) AS DOUBLE) / MAX(n)), 4) AS rms,
       CAST(SUM(CASE WHEN ABS(s) >= 32767 THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(n)                                    AS clipping_frac,
       CAST(MAX(ABS(s)) AS INT)                          AS peak
FROM s GROUP BY doc_id ORDER BY doc_id
"""


def q_multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio rate conversion end-to-end: the same deterministic clips
    as multimodal_audio (8 kHz mono, ``((doc_id·7919 + i·104729) mod
    65536) − 32768``), RESAMPLED to 4 kHz through the real codec
    (decode → nearest-sample index arithmetic → re-encode) and then
    featurized. Nearest-sample at a 2:1 ratio keeps exactly the
    even-index frames, so the oracle computes the features in closed
    form over ``s(doc, 2i)`` — a hash match proves the
    decode→resample→encode→decode→feature chain is sample-faithful.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import encode_wav

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 100 + did % 50
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)
                out.append((did, encode_wav(s, 8000)))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    blobs = d.mapInPandas(build, "item_id bigint, payload binary")
    from easydb_server_spark.operators.multimodal import audio_features, resample_audio

    resampled = resample_audio(blobs, "payload", "item_id", 4000)
    return (
        audio_features(resampled, "payload", "item_id")
        .select(
            "item_id",
            "sample_rate",
            "n_samples",
            "duration_ms",
            "rms",
            "clipping_frac",
            "peak",
        )
        .orderBy("item_id")
    )


ORACLE_MULTIMODAL_AUDIO_RESAMPLE = """
WITH nn AS (SELECT doc_id, (100 + doc_id % 50) // 2 AS n FROM documents),
s AS (
  SELECT nn.doc_id, nn.n,
         ((nn.doc_id * 7919 + (2 * t.i) * 104729) % 65536) - 32768 AS s
  FROM nn, UNNEST(generate_series(0, nn.n - 1)) t(i)
)
SELECT doc_id                                            AS item_id,
       CAST(4000 AS INT)                                 AS sample_rate,
       CAST(MAX(n) AS INT)                               AS n_samples,
       CAST(FLOOR(MAX(n) * 1000.0 / 4000) AS INT)        AS duration_ms,
       ROUND(SQRT(CAST(SUM(s * s) AS DOUBLE) / MAX(n)), 4) AS rms,
       CAST(SUM(CASE WHEN ABS(s) >= 32767 THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(n)                                    AS clipping_frac,
       CAST(MAX(ABS(s)) AS INT)                          AS peak
FROM s GROUP BY doc_id ORDER BY doc_id
"""


def q_multimodal_audio_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-10 codec paths end-to-end: each doc_id becomes a
    deterministic STEREO clip (two phase-shifted sawtooth channels,
    60 + doc_id % 40 frames, 8 kHz) encoded at a bit depth cycling
    with doc_id (8/16/24), remixed to MONO (integer-mean downmix,
    depth preserved — so the 8-bit lane re-quantizes the mono), then
    featurized. The oracle never sees bytes: it replays the sample
    recipe, the 8-bit quantization (floor(s/256)·256 — the (u−128)<<8
    widening), the floor-mean downmix, and the feature arithmetic in
    closed form, so a hash match proves the depth conversions and the
    remix are byte-faithful."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id")

    # r16 (guide §4): encode → remix → featurize runs fused in ONE
    # Arrow stage — the stereo blob and the remixed mono bytes never
    # cross the JVM↔Python boundary (was: three chained mapInPandas
    # stages). Identical codec calls (encode_wav → remix_wav →
    # wav_decoder, the bodies of remix_audio/audio_features) and the
    # same round(rms, 4); the composed chain's only other work was a
    # pure decode_wav whose result the final projection dropped.
    def build_feats(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import (
            encode_wav,
            remix_wav,
            wav_decoder,
        )

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 60 + did % 40
                bits = (8, 16, 24)[did % 3]
                i = np.arange(n, dtype=np.int64)
                s0 = ((did * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)
                s1 = ((did * 104729 + i * 7919) % 65536 - 32768).astype(np.int16)
                blob = encode_wav(np.stack([s0, s1], axis=1), 8000, bits=bits)
                feats = wav_decoder(remix_wav(blob, 1))
                out.append(
                    (
                        did,
                        feats["n_channels"],
                        feats["n_samples"],
                        feats["duration_ms"],
                        round(feats["rms"], 4),
                        feats["clipping_frac"],
                        feats["peak"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "n_channels", "n_samples", "duration_ms",
                    "rms", "clipping_frac", "peak",
                ],
            )

    return d.mapInPandas(
        build_feats,
        "item_id bigint, n_channels int, n_samples int, duration_ms int,"
        " rms double, clipping_frac double, peak int",
    ).orderBy("item_id")


ORACLE_MULTIMODAL_AUDIO_DEPTHS = """
WITH nn AS (
  SELECT doc_id, 60 + doc_id % 40 AS n,
         CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END AS bits
  FROM documents
),
raw AS (
  SELECT nn.doc_id, nn.n, nn.bits,
         ((nn.doc_id * 7919 + t.i * 104729) % 65536) - 32768 AS s0,
         ((nn.doc_id * 104729 + t.i * 7919) % 65536) - 32768 AS s1
  FROM nn, UNNEST(generate_series(0, nn.n - 1)) t(i)
),
quant AS (
  SELECT doc_id, n, bits,
         CASE WHEN bits = 8 THEN CAST(floor(s0 / 256.0) AS BIGINT) * 256 ELSE s0 END AS q0,
         CASE WHEN bits = 8 THEN CAST(floor(s1 / 256.0) AS BIGINT) * 256 ELSE s1 END AS q1
  FROM raw
),
mono AS (
  SELECT doc_id, n, bits,
         CASE WHEN bits = 8
              THEN CAST(floor(floor((q0 + q1) / 2.0) / 256.0) AS BIGINT) * 256
              ELSE CAST(floor((q0 + q1) / 2.0) AS BIGINT) END AS f
  FROM quant
)
SELECT doc_id                                               AS item_id,
       CAST(1 AS INT)                                       AS n_channels,
       CAST(MAX(n) AS INT)                                  AS n_samples,
       CAST(FLOOR(MAX(n) * 1000.0 / 8000) AS INT)           AS duration_ms,
       ROUND(SQRT(CAST(SUM(f * f) AS DOUBLE) / MAX(n)), 4)  AS rms,
       CAST(SUM(CASE WHEN ABS(f) >= 32767 THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(n)                                       AS clipping_frac,
       CAST(MAX(ABS(f)) AS INT)                             AS peak
FROM mono GROUP BY doc_id ORDER BY doc_id
"""


def q_text_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocklist-TABLE overload of url_features (round 10): the
    same synthesized URL corpus as text_url_filter, but the domain and
    keyword blocklists arrive as DataFrames and match via broadcast
    hash joins over the domain's dot-suffix set / the URL's
    alphanumeric tokens. The oracle replays the suffix-set semantics
    (equal OR dot-subdomain) and the TOKEN-exact keyword semantics —
    the documented narrowing from the literal form's
    substring-anywhere."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    host = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("spamexample.com"))
        .when(F.col("doc_id") % 7 == 1, F.lit("ads.spamexample.com"))
        .when(
            F.col("doc_id") % 7 == 2,
            F.concat(F.lit("h"), (F.col("doc_id") % 1000).cast("string"), F.lit("x99.net")),
        )
        .when(F.col("doc_id") % 7 == 3, F.lit("news.example.org"))
        .otherwise(F.lit("example.com"))
    )
    path = F.when(F.col("doc_id") % 7 == 4, F.lit("/casino-bonus/p")).otherwise(
        F.lit("/p")
    )
    built = d.select(
        "doc_id", F.concat(F.lit("https://"), host, path).alias("url")
    )
    # r17: Arrow-created fixture tables — createDataFrame over a
    # Python list parallelizes into 32 near-empty PYTHON-RDD
    # partitions, so every broadcast build of a 2-row blocklist paid
    # 32 task launches each with a Python-worker round trip; the
    # pandas/Arrow path embeds the rows JVM-side (no Python worker at
    # evaluation, 2 partitions). Same rows, same schema.
    import pandas as pd

    dom_tbl = spark.createDataFrame(
        pd.DataFrame({"domain": ["spamexample.com", "news.example.org"]}),
        "domain string",
    )
    kw_tbl = spark.createDataFrame(
        pd.DataFrame({"keyword": ["casino", "bonus"]}), "keyword string"
    )
    return T.url_features(
        built, "url", "doc_id", blocked_domains=dom_tbl, blocked_keywords=kw_tbl
    ).orderBy("doc_id")


ORACLE_TEXT_URL_BLOCKLIST = """
WITH built AS (
  SELECT doc_id,
         'https://'
         || CASE doc_id % 7
              WHEN 0 THEN 'spamexample.com'
              WHEN 1 THEN 'ads.spamexample.com'
              WHEN 2 THEN 'h' || CAST(doc_id % 1000 AS VARCHAR) || 'x99.net'
              WHEN 3 THEN 'news.example.org'
              ELSE 'example.com' END
         || CASE WHEN doc_id % 7 = 4 THEN '/casino-bonus/p' ELSE '/p' END AS url
  FROM documents
),
parsed AS (
  SELECT doc_id, lower(url) AS u,
         regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS domain,
         regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(lower(url), '\\?([^#]*)', 1) AS query
  FROM built
),
feats AS (
  SELECT doc_id, domain,
         regexp_extract(domain, '([^.]*)$', 1) AS tld,
         len(list_filter(string_split(path, '/'), x -> x != '')) AS path_depth,
         CASE WHEN query = '' THEN 0 ELSE len(string_split(query, '&')) END AS n_params,
         (CAST((CASE WHEN (length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g'))) < 0 THEN -(((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) >= (CAST(GREATEST(length(domain), 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) >= (CAST(GREATEST(length(domain), 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS digit_frac,
         (domain = 'spamexample.com' OR suffix(domain, '.spamexample.com')
          OR domain = 'news.example.org' OR suffix(domain, '.news.example.org')) AS blocked_domain,
         list_has_any(
           list_filter(regexp_split_to_array(u, '[^a-z0-9]+'), x -> x != ''),
           ['casino', 'bonus']) AS blocked_keyword
  FROM parsed
)
SELECT doc_id, domain, tld,
       CAST(path_depth AS INT) AS path_depth,
       CAST(n_params AS INT) AS n_params,
       digit_frac, blocked_domain, blocked_keyword,
       (NOT blocked_domain AND NOT blocked_keyword) AS pass_url
FROM feats ORDER BY doc_id
"""


def q_text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction: each document is wrapped into a
    deterministic page (head/style/comment/script blocks, heading from
    the first 20 chars, the text in a paragraph with an escaped
    ampersand, a list, an nbsp entity) and the extractor must strip
    the markup, keep block boundaries as newlines, and unescape — the
    oracle replays the construction AND the full regex pipeline."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit(
            '<html><head><title>T</title><STYLE>p {color:red}</STYLE></head>'
            "<body><!-- build 7 --><h1>"
        ),
        F.substring("text", 1, 20),
        F.lit("</h1><P>"),
        F.col("text"),
        F.lit(
            ' &amp; more</P><SCRIPT type="text/javascript">var x = 1 &lt; 2;'
            "</SCRIPT><ul><li>alpha</li><LI>beta</LI></ul>"
            "<DIV>tail&nbsp;note</DIV><BR></body></html>"
        ),
    )
    built = d.select("doc_id", html.alias("html"))
    return T.html_extract(built, "html", "doc_id").orderBy("doc_id")


ORACLE_TEXT_HTML_EXTRACT = r"""
WITH built AS (
  SELECT doc_id,
         '<html><head><title>T</title><STYLE>p {color:red}</STYLE></head>'
         || '<body><!-- build 7 --><h1>' || substr(text, 1, 20) || '</h1><P>'
         || text
         || ' &amp; more</P><SCRIPT type="text/javascript">var x = 1 &lt; 2;'
         || '</SCRIPT><ul><li>alpha</li><LI>beta</LI></ul>'
         || '<DIV>tail&nbsp;note</DIV><BR></body></html>' AS html
  FROM documents
),
stripped AS (
  SELECT doc_id,
         len(regexp_extract_all(html, '<[^>]*>')) AS n_tags,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html, '(?s)<!--.*?-->', '', 'g'),
                   '(?is)<script[^>]*>.*?</script>', '', 'g'),
                 '(?is)<style[^>]*>.*?</style>', '', 'g'),
               '(?i)<br[^>]*>', chr(10), 'g'),
             '(?i)</(p|div|h[1-6]|li|tr)>', chr(10), 'g'),
           '<[^>]*>', '', 'g') AS t
  FROM built
),
unescaped AS (
  SELECT doc_id, n_tags,
         replace(replace(replace(replace(replace(replace(t,
           '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           '&#39;', chr(39)), '&amp;', '&') AS t
  FROM stripped
),
collapsed AS (
  SELECT doc_id, n_tags,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '[ \t]+', ' ', 'g'),
               ' ?\n ?', chr(10), 'g'),
             '\n{2,}', chr(10) || chr(10), 'g'),
           '^\s+|\s+$', '', 'g') AS clean_text
  FROM unescaped
)
SELECT doc_id, clean_text,
       CAST(length(clean_text) AS INT) AS n_chars,
       CAST(n_tags AS INT) AS n_tags
FROM collapsed ORDER BY doc_id
"""


def q_text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc paragraph boilerplate removal (CCNet's primary dedup
    primitive): each doc becomes three paragraphs — a per-source
    boilerplate footer (shared by every doc of that source → removed
    everywhere), the doc's own text (unique → kept), and a
    first-45-chars teaser (unique → kept). Both engines replay the
    construction and the exact string-keyed doc-frequency."""
    d = load(spark, sf_dir, "documents")
    built = d.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.concat(F.lit("footer of "), F.col("source")),
            F.col("text"),
            F.substring("text", 1, 45),
        ).alias("text"),
    )
    return T.paragraph_dedup(built, "text", "doc_id", min_docs=2).orderBy("doc_id")


ORACLE_TEXT_PARAGRAPH_DEDUP = """
WITH built AS (
  SELECT doc_id,
         ['footer of ' || source, text, substr(text, 1, 45)] AS ps
  FROM documents
),
x AS (
  SELECT doc_id, t.i - 1 AS pos, ps[t.i] AS para
  FROM built, UNNEST(generate_series(1, len(ps))) t(i)
),
freq AS (
  SELECT para, COUNT(DISTINCT doc_id) AS n_docs FROM x GROUP BY para
),
drops AS (
  SELECT x.doc_id, x.pos FROM x JOIN freq USING (para) WHERE freq.n_docs >= 2
),
kept AS (
  SELECT x.doc_id, x.pos, x.para
  FROM x ANTI JOIN drops d ON d.doc_id = x.doc_id AND d.pos = x.pos
),
rebuilt AS (
  SELECT doc_id,
         STRING_AGG(para, chr(10) || chr(10) ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(len(b.ps) AS INT) AS n_paras,
       CAST(len(b.ps) - COALESCE(r.n_kept, 0) AS INT) AS n_removed
FROM built b LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
ORDER BY b.doc_id
"""


def q_text_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level curation gate over deterministically synthesized URLs:
    doc_id mod 7 picks the host shape (including a blocklisted domain,
    a subdomain of one, a digit-heavy spam host, and a keyword hit in
    the path), doc_id mod 3 + 1 path segments, a query string on even
    ids. The oracle replays construction, parsing, and both block
    rules."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    host = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("spamexample.com"))
        .when(F.col("doc_id") % 7 == 1, F.lit("ads.spamexample.com"))
        .when(F.col("doc_id") % 7 == 2, F.concat(F.lit("h"), (F.col("doc_id") % 1000).cast("string"), F.lit("x99.net")))
        .when(F.col("doc_id") % 7 == 3, F.lit("news.example.org"))
        .otherwise(F.lit("example.com"))
    )
    seg = F.concat(F.lit("seg"), (F.col("doc_id") % 5).cast("string"))
    path = F.concat(
        F.lit("/"),
        F.when(F.col("doc_id") % 7 == 4, F.lit("casino-bonus/")).otherwise(F.lit("")),
        F.concat_ws("/", F.array_repeat(seg, (F.col("doc_id") % 3 + 1).cast("int"))),
    )
    q = F.when(F.col("doc_id") % 2 == 0, F.lit("?a=1&b=2")).otherwise(F.lit(""))
    built = d.select(
        "doc_id", F.concat(F.lit("https://"), host, path, q).alias("url")
    )
    return T.url_features(
        built,
        "url",
        "doc_id",
        blocked_domains=("spamexample.com",),
        blocked_keywords=("casino",),
    ).orderBy("doc_id")


ORACLE_TEXT_URL_FILTER = """
WITH built AS (
  SELECT doc_id,
         'https://'
         || CASE doc_id % 7
              WHEN 0 THEN 'spamexample.com'
              WHEN 1 THEN 'ads.spamexample.com'
              WHEN 2 THEN 'h' || CAST(doc_id % 1000 AS VARCHAR) || 'x99.net'
              WHEN 3 THEN 'news.example.org'
              ELSE 'example.com' END
         || '/'
         || CASE WHEN doc_id % 7 = 4 THEN 'casino-bonus/' ELSE '' END
         || array_to_string(
              [ 'seg' || CAST(doc_id % 5 AS VARCHAR)
                FOR i IN generate_series(1, CAST(doc_id % 3 + 1 AS INT)) ], '/')
         || CASE WHEN doc_id % 2 = 0 THEN '?a=1&b=2' ELSE '' END AS url
  FROM documents
),
parsed AS (
  SELECT doc_id, lower(url) AS u,
         regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS domain,
         regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(lower(url), '\\?([^#]*)', 1) AS query
  FROM built
),
feats AS (
  SELECT doc_id, domain,
         regexp_extract(domain, '([^.]*)$', 1) AS tld,
         len(list_filter(string_split(path, '/'), x -> x != '')) AS path_depth,
         CASE WHEN query = '' THEN 0 ELSE len(string_split(query, '&')) END AS n_params,
         (CAST((CASE WHEN (length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g'))) < 0 THEN -(((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) >= (CAST(GREATEST(length(domain), 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100 + ((((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) // (CAST(GREATEST(length(domain), 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(length(domain) - length(regexp_replace(domain, '[0-9]', '', 'g')) AS BIGINT)) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) * 100) % (CAST(GREATEST(length(domain), 1) AS BIGINT))) >= (CAST(GREATEST(length(domain), 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS digit_frac,
         (domain = 'spamexample.com' OR suffix(domain, '.spamexample.com')) AS blocked_domain,
         contains(u, 'casino') AS blocked_keyword
  FROM parsed
)
SELECT doc_id, domain, tld,
       CAST(path_depth AS INT) AS path_depth,
       CAST(n_params AS INT) AS n_params,
       digit_frac, blocked_domain, blocked_keyword,
       (NOT blocked_domain AND NOT blocked_keyword) AS pass_url
FROM feats ORDER BY doc_id
"""


def q_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-to-corpus front half composed in ONE plan:
    synthesized page + URL per doc → URL gate (drops the blocklisted
    doc_id%7∈{0,1} hosts and the %7=4 keyword paths) → HTML→text
    extraction → cross-doc LINE dedup (sep="\\n": the extracted pages
    share the alpha/beta/tail boilerplate lines, which must vanish
    everywhere) → Gopher word-count check on what survives. Returns
    (doc_id, domain, n_paras, n_removed, n_words, word_count_ok) for
    admitted docs — each stage's oracle fragment is individually
    driver-verified (text_url_filter, text_html_extract,
    text_paragraph_dedup, text_gopher_rules); this entry locks their
    COMPOSITION."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit(
            '<html><head><title>T</title><STYLE>p {color:red}</STYLE></head>'
            "<body><!-- build 7 --><h1>"
        ),
        F.substring("text", 1, 20),
        F.lit("</h1><P>"),
        F.col("text"),
        F.lit(
            ' &amp; more</P><SCRIPT type="text/javascript">var x = 1 &lt; 2;'
            "</SCRIPT><ul><li>alpha</li><LI>beta</LI></ul>"
            "<DIV>tail&nbsp;note</DIV><BR></body></html>"
        ),
    )
    host = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("spamexample.com"))
        .when(F.col("doc_id") % 7 == 1, F.lit("ads.spamexample.com"))
        .otherwise(F.lit("example.com"))
    )
    path = F.when(F.col("doc_id") % 7 == 4, F.lit("/casino-bonus/p")).otherwise(F.lit("/p"))
    built = d.select(
        "doc_id",
        html.alias("html"),
        F.concat(F.lit("https://"), host, path).alias("url"),
    )
    ok = (
        T.url_features(
            built,
            "url",
            "doc_id",
            blocked_domains=("spamexample.com",),
            blocked_keywords=("casino",),
        )
        .where(F.col("pass_url"))
        .select("doc_id", "domain")
    )
    fetched = built.join(ok, "doc_id")
    # materialize the extracted text ONCE: it feeds the dedup
    # frequency count, the rebuild, and (via the rebuilt text) the
    # gopher gate — without this Catalyst re-runs the regex extraction
    # per consumer (13 scans in the static plan; 2.2 s → 1.9 s at
    # sf0.1, and at 100 TB the difference is re-extracting the crawl
    # per stage). The real pipeline persists extracted text at exactly
    # this boundary.
    # r16 (guide §2.4): `domain` rides INTO the checkpoint (html_extract
    # keep=) — the final projection previously re-joined `ok`, which
    # re-evaluated the whole url_features explode/semi-join pipeline a
    # second time; now the URL gate runs exactly once and the final
    # domain lookup is a narrow scan of the checkpointed frame.
    extracted = (
        T.html_extract(fetched, "html", "doc_id", keep=["domain"])
        .select("doc_id", "domain", "clean_text")
        .localCheckpoint(eager=True)
    )
    deduped = T.paragraph_dedup(
        extracted.select("doc_id", "clean_text"), "clean_text", "doc_id",
        min_docs=2, sep="\n",
    )
    # r16 (guide §2.4): the gopher gate is a pure projection, so
    # n_paras/n_removed ride THROUGH it (keep=) instead of re-joining
    # `deduped` — the rejoin re-ran paragraph_dedup's whole shuffle
    # chain (explode → doc-frequency agg → verify window → rebuild) a
    # second time.
    gated = T.gopher_rules(
        deduped, "clean_text", "doc_id",
        min_words=40, min_stopwords=1, keep=["n_paras", "n_removed"],
    ).select("doc_id", "n_paras", "n_removed", "n_words", "word_count_ok")
    return (
        gated
        .join(extracted.select("doc_id", "domain"), "doc_id")
        .select("doc_id", "domain", "n_paras", "n_removed", "n_words", "word_count_ok")
        .orderBy("doc_id")
    )


ORACLE_CRAWL_PIPELINE = r"""
WITH built AS (
  SELECT doc_id,
         '<html><head><title>T</title><STYLE>p {color:red}</STYLE></head>'
         || '<body><!-- build 7 --><h1>' || substr(text, 1, 20) || '</h1><P>'
         || text
         || ' &amp; more</P><SCRIPT type="text/javascript">var x = 1 &lt; 2;'
         || '</SCRIPT><ul><li>alpha</li><LI>beta</LI></ul>'
         || '<DIV>tail&nbsp;note</DIV><BR></body></html>' AS html,
         'https://'
         || CASE doc_id % 7 WHEN 0 THEN 'spamexample.com'
                            WHEN 1 THEN 'ads.spamexample.com'
                            ELSE 'example.com' END
         || CASE WHEN doc_id % 7 = 4 THEN '/casino-bonus/p' ELSE '/p' END AS url
  FROM documents
),
ok AS (
  SELECT doc_id,
         regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS domain
  FROM built
  WHERE NOT (
    regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) = 'spamexample.com'
    OR suffix(regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), '.spamexample.com')
    OR contains(lower(url), 'casino')
  )
),
extracted AS (
  SELECT b.doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 replace(replace(replace(replace(replace(replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(b.html, '(?s)<!--.*?-->', '', 'g'),
                             '(?is)<script[^>]*>.*?</script>', '', 'g'),
                           '(?is)<style[^>]*>.*?</style>', '', 'g'),
                         '(?i)<br[^>]*>', chr(10), 'g'),
                       '(?i)</(p|div|h[1-6]|li|tr)>', chr(10), 'g'),
                     '<[^>]*>', '', 'g'),
                   '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&#39;', chr(39)), '&amp;', '&'),
                 '[ \t]+', ' ', 'g'),
               ' ?\n ?', chr(10), 'g'),
             '\n{2,}', chr(10) || chr(10), 'g'),
           '^\s+|\s+$', '', 'g') AS clean_text
  FROM built b JOIN ok USING (doc_id)
),
x AS (
  SELECT e.doc_id, t.i - 1 AS pos, ls[t.i] AS para, len(ls) AS n_paras
  FROM (SELECT doc_id, string_split(clean_text, chr(10)) AS ls FROM extracted) e(doc_id, ls),
       UNNEST(generate_series(1, len(ls))) t(i)
),
freq AS (SELECT para, COUNT(DISTINCT doc_id) AS n_docs FROM x GROUP BY para),
kept AS (
  SELECT x.doc_id, x.pos, x.para, x.n_paras
  FROM x JOIN freq USING (para) WHERE freq.n_docs < 2
),
rebuilt AS (
  SELECT doc_id,
         STRING_AGG(para, chr(10) ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept, MAX(n_paras) AS n_paras
  FROM kept GROUP BY doc_id
),
dd AS (
  SELECT e.doc_id, COALESCE(r.clean_text, '') AS clean_text
  FROM extracted e LEFT JOIN rebuilt r USING (doc_id)
),
counts AS (
  SELECT x.doc_id, MAX(x.n_paras) AS n_paras,
         MAX(x.n_paras) - COALESCE(SUM(CASE WHEN freq.n_docs < 2 THEN 1 ELSE 0 END), 0) AS n_removed
  FROM x JOIN freq USING (para) GROUP BY x.doc_id
),
words AS (
  SELECT d.doc_id,
         len(list_filter(regexp_split_to_array(d.clean_text, '\s+'), w -> w != '')) AS n_words
  FROM dd d
)
SELECT o.doc_id, o.domain,
       CAST(c.n_paras AS INT) AS n_paras,
       CAST(c.n_removed AS INT) AS n_removed,
       CAST(w.n_words AS INT) AS n_words,
       (w.n_words >= 40 AND w.n_words <= 100000) AS word_count_ok
FROM ok o
JOIN counts c USING (doc_id)
JOIN words w USING (doc_id)
ORDER BY o.doc_id
"""


def q_text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete 13-signal Gopher repetition filter (Rae et al.
    2021 Table A1). Fixture docs are single-line, so the construction
    makes repetition observable: text + two copies of its first 40
    chars as extra lines (duplicate lines + a duplicated paragraph
    boundary), with the natural n-gram structure of the text driving
    the nine gram-coverage signals. The oracle replays construction,
    every in-row line/paragraph statistic, the deterministic argmax
    per n, and the span-coverage character counts."""
    d = load(spark, sf_dir, "documents")
    built = d.select(
        "doc_id",
        F.concat_ws(
            "\n", F.col("text"), F.substring("text", 1, 40), F.substring("text", 1, 40)
        ).alias("text"),
    )
    # r16: impl="python" (the zero-exchange Arrow formulation) — the
    # r10 study measured it 1.3x SLOWER than the agg path; re-measured
    # on Spark 4.1 it is now 2.7x FASTER (5.38 s -> 1.99 s, 1.31 s
    # with the spread below), so the bench/conformance entry runs it.
    # The two impls agree bit-for-bit (differential pytest,
    # tests/test_r10_fixes.py) and the oracle replays unchanged.
    return T.gopher_repetition_rules(built, "text", "doc_id", impl="python").orderBy(
        "doc_id"
    )


def _oracle_gopher_repetition(
    t_expr: str = "text || chr(10) || substr(text, 1, 40) || chr(10) || substr(text, 1, 40)",
    source: str = "documents",
) -> str:
    """Generated DuckDB replay of gopher_repetition_rules over the
    conformance construction: per n ∈ 2..10, gram counts → flagged
    start positions (argmax gram for n ≤ 4, duplicated grams for
    n ≥ 5) → span-coverage character sums via EXISTS + LAG.
    ``t_expr``/``source`` parametrize the input document expression so
    the pathological fuzz can replay the operator over RAW drawn text
    (``_oracle_gopher_repetition("text", "docs_nn")``)."""
    from easydb_server_spark.operators.text import GOPHER_REPETITION_THRESHOLDS

    # gram identity is the raw string with the (count, length, gram)
    # tie order — byte-for-byte the Spark plan
    parts = [
        f"""WITH built AS (
  SELECT doc_id,
         {t_expr} AS t
  FROM {source}
),
base AS (
  SELECT doc_id, t,
         GREATEST(length(t), 1) AS n_chars,
         string_split(t, ' ') AS ws,
         string_split(t, chr(10)) AS ls,
         string_split(t, chr(10) || chr(10)) AS ps
  FROM built
),
inrow_n AS (
  SELECT doc_id, n_chars,
    len(ls) - len(list_distinct(ls)) AS dl_cnt, GREATEST(len(ls), 1) AS nl,
    len(ps) - len(list_distinct(ps)) AS dp_cnt, GREATEST(len(ps), 1) AS np,
    COALESCE(list_sum(list_transform(list_distinct(ls),
        d -> (len(list_filter(ls, x -> x = d)) - 1) * length(d))), 0) AS dl_chars,
    COALESCE(list_sum(list_transform(list_distinct(ps),
        d -> (len(list_filter(ps, x -> x = d)) - 1) * length(d))), 0) AS dp_chars
  FROM base
),
inrow AS (
  SELECT doc_id, n_chars,
    (CAST((CASE WHEN (dl_cnt) < 0 THEN -(((((abs(CAST(dl_cnt AS BIGINT)) // (CAST(nl AS BIGINT))) * 100 + ((abs(CAST(dl_cnt AS BIGINT)) % (CAST(nl AS BIGINT))) * 100) // (CAST(nl AS BIGINT))) * 100 + ((((abs(CAST(dl_cnt AS BIGINT)) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) // (CAST(nl AS BIGINT))) * 100 + ((((((abs(CAST(dl_cnt AS BIGINT)) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) // (CAST(nl AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(dl_cnt AS BIGINT)) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) >= (CAST(nl AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(dl_cnt AS BIGINT)) // (CAST(nl AS BIGINT))) * 100 + ((abs(CAST(dl_cnt AS BIGINT)) % (CAST(nl AS BIGINT))) * 100) // (CAST(nl AS BIGINT))) * 100 + ((((abs(CAST(dl_cnt AS BIGINT)) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) // (CAST(nl AS BIGINT))) * 100 + ((((((abs(CAST(dl_cnt AS BIGINT)) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) // (CAST(nl AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(dl_cnt AS BIGINT)) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) * 100) % (CAST(nl AS BIGINT))) >= (CAST(nl AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS dup_line_frac,
    (CAST((CASE WHEN (dp_cnt) < 0 THEN -(((((abs(CAST(dp_cnt AS BIGINT)) // (CAST(np AS BIGINT))) * 100 + ((abs(CAST(dp_cnt AS BIGINT)) % (CAST(np AS BIGINT))) * 100) // (CAST(np AS BIGINT))) * 100 + ((((abs(CAST(dp_cnt AS BIGINT)) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) // (CAST(np AS BIGINT))) * 100 + ((((((abs(CAST(dp_cnt AS BIGINT)) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) // (CAST(np AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(dp_cnt AS BIGINT)) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) >= (CAST(np AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(dp_cnt AS BIGINT)) // (CAST(np AS BIGINT))) * 100 + ((abs(CAST(dp_cnt AS BIGINT)) % (CAST(np AS BIGINT))) * 100) // (CAST(np AS BIGINT))) * 100 + ((((abs(CAST(dp_cnt AS BIGINT)) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) // (CAST(np AS BIGINT))) * 100 + ((((((abs(CAST(dp_cnt AS BIGINT)) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) // (CAST(np AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(dp_cnt AS BIGINT)) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) * 100) % (CAST(np AS BIGINT))) >= (CAST(np AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS dup_para_frac,
    (CAST((CASE WHEN (dl_chars) < 0 THEN -(((((abs(CAST(dl_chars AS BIGINT)) // (CAST(n_chars AS BIGINT))) * 100 + ((abs(CAST(dl_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) * 100 + ((((abs(CAST(dl_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) * 100 + ((((((abs(CAST(dl_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(dl_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) >= (CAST(n_chars AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(dl_chars AS BIGINT)) // (CAST(n_chars AS BIGINT))) * 100 + ((abs(CAST(dl_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) * 100 + ((((abs(CAST(dl_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) * 100 + ((((((abs(CAST(dl_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(dl_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) >= (CAST(n_chars AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS dup_line_char_frac,
    (CAST((CASE WHEN (dp_chars) < 0 THEN -(((((abs(CAST(dp_chars AS BIGINT)) // (CAST(n_chars AS BIGINT))) * 100 + ((abs(CAST(dp_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) * 100 + ((((abs(CAST(dp_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) * 100 + ((((((abs(CAST(dp_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(dp_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) >= (CAST(n_chars AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(dp_chars AS BIGINT)) // (CAST(n_chars AS BIGINT))) * 100 + ((abs(CAST(dp_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) * 100 + ((((abs(CAST(dp_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) * 100 + ((((((abs(CAST(dp_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) // (CAST(n_chars AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(dp_chars AS BIGINT)) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) * 100) % (CAST(n_chars AS BIGINT))) >= (CAST(n_chars AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS dup_para_char_frac
  FROM inrow_n
),
toks AS (
  SELECT doc_id, t.i - 1 AS i, ws[t.i] AS word
  FROM base, UNNEST(generate_series(1, len(ws))) t(i)
)"""
    ]
    for n in range(2, 11):
        parts.append(
            f""",
g{n} AS (
  SELECT doc_id, t.i AS pos, array_to_string(ws[t.i + 1 : t.i + {n}], ' ') AS gram
  FROM base, UNNEST(generate_series(0, len(ws) - {n})) t(i)
  WHERE len(ws) >= {n}
),
c{n} AS (SELECT doc_id, gram, COUNT(*) AS c FROM g{n} GROUP BY doc_id, gram)"""
        )
        if n <= 4:
            parts.append(
                f""",
s{n} AS (
  SELECT g.doc_id, g.pos FROM g{n} g
  JOIN (SELECT doc_id, gram FROM (
          SELECT doc_id, gram,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY c DESC, length(gram) DESC, gram DESC) AS r
          FROM c{n}) WHERE r = 1) tg
  ON tg.doc_id = g.doc_id AND tg.gram = g.gram
)"""
            )
        else:
            parts.append(
                f""",
s{n} AS (
  SELECT g.doc_id, g.pos FROM g{n} g
  JOIN c{n} c ON c.doc_id = g.doc_id AND c.gram = g.gram
  WHERE c.c > 1
)"""
            )
        parts.append(
            f""",
cf{n} AS (
  SELECT tk.doc_id, tk.i, tk.word,
         EXISTS (SELECT 1 FROM s{n} s
                 WHERE s.doc_id = tk.doc_id AND tk.i >= s.pos AND tk.i < s.pos + {n}) AS cov
  FROM toks tk
),
cp{n} AS (
  SELECT doc_id, i, word, cov,
         LAG(cov, 1, FALSE) OVER (PARTITION BY doc_id ORDER BY i) AS pcov
  FROM cf{n}
),
cov{n} AS (
  SELECT doc_id,
         SUM(CASE WHEN cov THEN length(word) ELSE 0 END)
         + SUM(CASE WHEN cov AND pcov THEN 1 ELSE 0 END) AS chars
  FROM cp{n} GROUP BY doc_id
)"""
        )
    sig_exprs = []
    for n in (2, 3, 4):
        sig_exprs.append(
            f"{round_div_sql(f'COALESCE(cov{n}.chars, 0)', 'i.n_chars', 6, 'duckdb')} AS top_{n}gram_char_frac"
        )
    for n in range(5, 11):
        sig_exprs.append(
            f"{round_div_sql(f'COALESCE(cov{n}.chars, 0)', 'i.n_chars', 6, 'duckdb')} AS dup_{n}gram_char_frac"
        )
    pass_terms = []
    for name, thr in GOPHER_REPETITION_THRESHOLDS.items():
        if name.startswith("dup_") and "gram" not in name:
            pass_terms.append(f"i.{name} <= {thr}")
        else:
            n = "".join(ch for ch in name.split("_")[1] if ch.isdigit())
            frac = round_div_sql(f"COALESCE(cov{n}.chars, 0)", "i.n_chars", 6, "duckdb")
            pass_terms.append(f"{frac} <= {thr}")
    joins = "\n".join(
        f"LEFT JOIN cov{n} ON cov{n}.doc_id = i.doc_id" for n in range(2, 11)
    )
    parts.append(
        f"""
SELECT i.doc_id, i.dup_line_frac, i.dup_para_frac,
       i.dup_line_char_frac, i.dup_para_char_frac,
       {", ".join(sig_exprs)},
       ({" AND ".join(pass_terms)}) AS pass_repetition
FROM inrow i
{joins}
ORDER BY i.doc_id"""
    )
    return "".join(parts)


ORACLE_TEXT_GOPHER_REPETITION = _oracle_gopher_repetition()


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return T.normalize_text(d, "text", "doc_id").orderBy("doc_id")


ORACLE_TEXT_NORMALIZE = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text, md5(norm_text) AS norm_hash,
       CAST(length(norm_text) AS INT) AS norm_len
FROM n ORDER BY doc_id
"""


def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a corpus with deterministically injected
    emails/IPs/phone numbers (the raw corpus has none, so injection
    makes the masking observable); oracle replays the same injection
    and the same shared-dialect regexes."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    with_pii = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0.0."),
            (F.col("doc_id") % 255).cast("string"),
            F.lit(" or call 555-0100 ext "),
            F.col("doc_id").cast("string"),
        ),
    )
    return T.redact_pii(with_pii, "text", "doc_id").orderBy("doc_id")


ORACLE_TEXT_REDACT = (
    """
WITH with_pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.0.0.' || CAST(doc_id % 255 AS VARCHAR)
              || ' or call 555-0100 ext ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id < 500
),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '@EMAIL@')) AS INT) AS n_emails,
         regexp_replace(text, '@EMAIL@', '<EMAIL>', 'g') AS t
  FROM with_pii
),
s2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t, '@IP@')) AS INT) AS n_ips,
         regexp_replace(t, '@IP@', '<IP>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_ips,
         CAST(len(regexp_extract_all(t, '@PHONE@')) AS INT) AS n_phones,
         regexp_replace(t, '@PHONE@', '<PHONE>', 'g') AS redacted
  FROM s2
)
SELECT doc_id, redacted, n_emails, n_ips, n_phones
FROM s3 ORDER BY doc_id
"""
    .replace("@EMAIL@", T.EMAIL_RE)
    .replace("@IP@", T.IPV4_RE)
    .replace("@PHONE@", T.PHONE_RE)
)


def q_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return llm_vocab_sorted(T.vocabulary(d, "text", top_k=50))


def llm_vocab_sorted(df: DataFrame) -> DataFrame:
    return df.orderBy(F.col("n_total").desc(), "term")


ORACLE_TEXT_VOCAB = """
WITH terms AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(text, ' +')) t(term)
  WHERE t.term != ''
)
SELECT term, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
FROM terms
GROUP BY term
ORDER BY n_total DESC, term
LIMIT 50
"""


def q_text_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixture sampling: per-source keep rates
    (upweight curated, downsample crawl) via md5 bucketing; the oracle
    replays the identical hash + rate table."""
    d = load(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
    out = T.weighted_mixture(d, "doc_id", "source", rates, default_rate=0.05)
    return (
        out.groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.min("doc_id").alias("first_doc"))
        .orderBy("source")
    )


ORACLE_TEXT_MIXTURE = """
WITH b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS mix_bucket,
         CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                     WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.1
                     ELSE 0.05 END AS rate
  FROM documents
)
SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS first_doc
FROM b
WHERE mix_bucket < FLOOR(rate * 10000)
GROUP BY source
ORDER BY source
"""


# ---------- dataset splitting ----------


def q_text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (the reproducible
    alternative to sample()): assignment = md5(salt||id) % 100 bands,
    stable across engines/cluster sizes/data order — which is exactly
    why the DuckDB oracle can replay it bit-for-bit."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    out = T.hash_split(d, "doc_id", {"train": (0, 80), "val": (80, 90), "test": (90, 100)})
    return (
        out.groupBy("split")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("first_doc"))
        .orderBy("split")
    )


ORACLE_TEXT_HASH_SPLIT = """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
),
s AS (
  SELECT doc_id,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT split, COUNT(*) AS n, MIN(doc_id) AS first_doc
FROM s GROUP BY split ORDER BY split
"""


def q_text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into 512-token bins, per source shard (window
    cumsum -> bin id -> per-bin stats)."""
    d = load(spark, sf_dir, "documents")
    return T.pack_sequences(d, "text", "doc_id", "source", token_budget=512).orderBy("grp", "bin")


ORACLE_TEXT_PACK = """
WITH t AS (
  SELECT source AS grp, doc_id AS doc,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
b AS (
  SELECT grp, doc, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY grp ORDER BY doc
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                    / 512.0) AS BIGINT) AS bin
  FROM t
)
SELECT grp, bin, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc) AS first_doc, MAX(doc) AS last_doc
FROM b GROUP BY grp, bin ORDER BY grp, bin
"""


# ---------- round-3 corpus-curation additions ----------


def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: source 'src0' is the held-out eval
    set; every other-source doc sharing a 3-word shingle with it is
    dropped from the training corpus."""
    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("source") == "src0")
    train = d.where(F.col("source") != "src0")
    return (
        T.decontaminate(train, bench, "text", "doc_id")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


ORACLE_TEXT_DECONTAMINATE = """
WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
sh_all AS (
  SELECT doc_id, source, array_to_string(ws[t.i + 1 : t.i + 3], ' ') AS shingle
  FROM words, UNNEST(generate_series(0, greatest(len(ws) - 3, 0))) t(i)
),
sh AS (SELECT DISTINCT doc_id, source,
              CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
       FROM sh_all),
bench AS (SELECT DISTINCT h FROM sh WHERE source = 'src0'),
bad AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.h = b.h
  WHERE s.source != 'src0'
)
SELECT doc_id, source FROM documents
WHERE source != 'src0' AND doc_id NOT IN (SELECT doc_id FROM bad)
ORDER BY doc_id
"""


def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram per language."""
    d = load(spark, sf_dir, "documents")
    return T.length_histogram(d, "n_chars", "lang").orderBy("grp", "bucket")


ORACLE_TEXT_LENGTH_HISTOGRAM = """
SELECT lang AS grp,
       CAST(CASE WHEN n_chars <= 0 THEN 0 ELSE length(bin(n_chars)) END AS INT) AS bucket,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_len,
       MAX(n_chars) AS max_len,
       (CAST((CASE WHEN (SUM(n_chars)) < 0 THEN -(((abs(CAST(SUM(n_chars) AS BIGINT)) // (CAST(COUNT(*) AS BIGINT))) * 100 + ((abs(CAST(SUM(n_chars) AS BIGINT)) % (CAST(COUNT(*) AS BIGINT))) * 100) // (CAST(COUNT(*) AS BIGINT))) + (CASE WHEN 2 * (((abs(CAST(SUM(n_chars) AS BIGINT)) % (CAST(COUNT(*) AS BIGINT))) * 100) % (CAST(COUNT(*) AS BIGINT))) >= (CAST(COUNT(*) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((abs(CAST(SUM(n_chars) AS BIGINT)) // (CAST(COUNT(*) AS BIGINT))) * 100 + ((abs(CAST(SUM(n_chars) AS BIGINT)) % (CAST(COUNT(*) AS BIGINT))) * 100) // (CAST(COUNT(*) AS BIGINT))) + (CASE WHEN 2 * (((abs(CAST(SUM(n_chars) AS BIGINT)) % (CAST(COUNT(*) AS BIGINT))) * 100) % (CAST(COUNT(*) AS BIGINT))) >= (CAST(COUNT(*) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 100.0) AS avg_len
FROM documents
GROUP BY grp, bucket
ORDER BY grp, bucket
"""


def q_text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language by frequency."""
    d = load(spark, sf_dir, "documents")
    return T.ngram_topk(d, "text", "lang", n=2, k=5).orderBy("grp", "rank")


ORACLE_TEXT_NGRAM_TOPK = """
WITH words AS (SELECT lang, string_split(text, ' ') AS ws FROM documents),
grams AS (
  SELECT lang AS grp, array_to_string(ws[t.i + 1 : t.i + 2], ' ') AS ngram
  FROM words, UNNEST(generate_series(0, greatest(len(ws) - 2, 0))) t(i)
),
counts AS (SELECT grp, ngram, COUNT(*) AS n FROM grams GROUP BY grp, ngram)
SELECT grp, ngram, n, rank FROM (
  SELECT grp, ngram, n,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY n DESC, ngram) AS rank
  FROM counts
) WHERE rank <= 5
ORDER BY grp, rank
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition filter: duplicate-word
    fraction + top-bigram share per doc, with a keep flag (thresholds
    tuned to the synthetic corpus's small vocabulary so the flag
    actually splits it)."""
    d = load(spark, sf_dir, "documents")
    return T.repetition_metrics(
        d, "text", "doc_id", max_dup_word_frac=0.55, max_top_bigram_frac=0.05
    ).orderBy("doc_id")


ORACLE_TEXT_REPETITION = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
b AS (
  SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
         CAST(len(ws) - len(list_distinct(ws)) AS INT) AS n_dup_words, ws
  FROM t
),
grams AS (
  SELECT doc_id, n_words, n_dup_words,
         array_to_string(ws[t.i + 1 : t.i + 2], ' ') AS bigram
  FROM b, UNNEST(generate_series(0, greatest(n_words - 2, 0))) t(i)
),
counts AS (
  SELECT doc_id, n_words, n_dup_words, bigram, COUNT(*) AS n
  FROM grams GROUP BY ALL
),
per_doc AS (
  SELECT doc_id, n_words, n_dup_words,
         CAST(MAX(n) AS INT) AS top_bigram_n, SUM(n) AS n_bigrams
  FROM counts GROUP BY ALL
)
SELECT doc_id, n_words,
       (CAST((CASE WHEN (n_dup_words) < 0 THEN -(((((abs(CAST(n_dup_words AS BIGINT)) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) >= (CAST(GREATEST(n_words, 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_dup_words AS BIGINT)) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) >= (CAST(GREATEST(n_words, 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS dup_word_frac,
       top_bigram_n,
       (CAST((CASE WHEN (top_bigram_n) < 0 THEN -(((((abs(CAST(top_bigram_n AS BIGINT)) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) >= (CAST(GREATEST(n_bigrams, 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(top_bigram_n AS BIGINT)) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) >= (CAST(GREATEST(n_bigrams, 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS top_bigram_frac,
       ((CAST((CASE WHEN (n_dup_words) < 0 THEN -(((((abs(CAST(n_dup_words AS BIGINT)) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) >= (CAST(GREATEST(n_words, 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_dup_words AS BIGINT)) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100 + ((((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_words, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_dup_words AS BIGINT)) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_words, 1) AS BIGINT))) >= (CAST(GREATEST(n_words, 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) <= 0.55
        AND (CAST((CASE WHEN (top_bigram_n) < 0 THEN -(((((abs(CAST(top_bigram_n AS BIGINT)) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) >= (CAST(GREATEST(n_bigrams, 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(top_bigram_n AS BIGINT)) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100 + ((((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(top_bigram_n AS BIGINT)) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_bigrams, 1) AS BIGINT))) >= (CAST(GREATEST(n_bigrams, 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) <= 0.05) AS keep
FROM per_doc ORDER BY doc_id
"""


def q_text_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality pruning: keep the top half of each lang by
    the composite quality score (exact rank semantics)."""
    d = load(spark, sf_dir, "documents")
    return T.quality_prune(d, "text", "doc_id", "lang", keep_frac=0.5).orderBy(
        "grp", "rank_in_grp"
    )


ORACLE_TEXT_QUALITY_PRUNE = f"""
WITH t AS (
  SELECT doc_id, lang AS grp, text, string_split(text, ' ') AS ws,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS INT) AS n_punct
  FROM documents
),
t2 AS (
  SELECT doc_id, grp, n_chars, n_words, n_punct,
         CAST(len(list_filter(ws, w -> list_contains([{", ".join(repr(w) for w in T.LANG_PROFILES["en"])}], w))) AS INT) AS n_stopwords
  FROM t
),
q AS (
  SELECT doc_id, grp, (CAST((CASE WHEN (qnum) < 0 THEN -(((((abs(CAST(qnum AS BIGINT)) // (CAST(qden AS BIGINT))) * 100 + ((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) >= (CAST(qden AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(qnum AS BIGINT)) // (CAST(qden AS BIGINT))) * 100 + ((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) >= (CAST(qden AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS quality
  FROM (SELECT *, CAST(n_words AS BIGINT) * GREATEST(n_words, 1) * GREATEST(n_chars, 1) + 800 * CAST(n_stopwords AS BIGINT) * GREATEST(n_chars, 1) - 2000 * CAST(n_punct AS BIGINT) * GREATEST(n_words, 1) AS qnum, 400 * CAST(GREATEST(n_words, 1) AS BIGINT) * GREATEST(n_chars, 1) AS qden FROM t2)
),
r AS (
  SELECT doc_id, grp, quality,
         CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY quality DESC, doc_id) AS INT) AS rank_in_grp,
         COUNT(*) OVER (PARTITION BY grp) AS n_grp
  FROM q
)
SELECT doc_id, grp, quality, rank_in_grp, n_grp,
       rank_in_grp <= CEIL(0.5 * n_grp) AS kept
FROM r ORDER BY grp, rank_in_grp
"""


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + 8-way sharding of the corpus
    (reproducible training order as a pure function of seed and id)."""
    d = load(spark, sf_dir, "documents")
    return T.corpus_shuffle(d, "doc_id", n_shards=8, seed="v1").orderBy("shard", "pos")


ORACLE_CORPUS_SHUFFLE = """
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents
)
SELECT doc_id, CAST(h % 8 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS INT) AS pos
FROM h
ORDER BY shard, pos
"""


def q_emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-outlier pruning: bottom 10% of each label by cosine
    to the label centroid (mislabeled/off-distribution candidates)."""
    e = load(spark, sf_dir, "embeddings")
    return S.label_outliers(e, "embedding", "label", "vec_id", bottom_frac=0.1).orderBy(
        "label", "rank_in_label"
    )


ORACLE_EMB_LABEL_OUTLIERS = """
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
crows AS (
  SELECT label, t.i - 1 AS pos, ROUND(AVG(vec[t.i]), 5) AS m
  FROM v, UNNEST(generate_series(1, len(vec))) t(i)
  GROUP BY label, t.i
),
c AS (SELECT label, list(m ORDER BY pos) AS centroid FROM crows GROUP BY label),
s AS (
  -- zero-norm guard mirrors operators/similarity.py:label_outliers:
  -- degenerate vectors pin to 0.0 on both engines
  SELECT v.vec_id, v.label,
         CASE WHEN list_dot_product(v.vec, v.vec) > 0
               AND list_dot_product(c.centroid, c.centroid) > 0
              THEN ROUND(list_cosine_similarity(v.vec, c.centroid), 6)
              ELSE 0.0 END AS cos_centroid
  FROM v JOIN c USING (label)
),
r AS (
  SELECT vec_id, label, cos_centroid,
         CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos_centroid ASC, vec_id) AS INT)
           AS rank_in_label,
         COUNT(*) OVER (PARTITION BY label) AS n_label
  FROM s
)
SELECT vec_id, label, cos_centroid, rank_in_label, n_label,
       rank_in_label <= CEIL(0.1 * n_label) AS outlier
FROM r ORDER BY label, rank_in_label
"""


def q_emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (class prototypes) + counts.

    Long form — one (label, pos, m, n_vecs) row per vector element —
    because the harness's canonicalizer requires scalar result columns
    (array cells are unhashable in its sort/hash step).
    """
    e = load(spark, sf_dir, "embeddings")
    return S.label_centroid_rows(e, "embedding", "label").orderBy("label", "pos")


ORACLE_EMB_LABEL_CENTROIDS = """
WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
SELECT label, t.i - 1 AS pos, ROUND(AVG(vec[t.i]), 5) AS m, COUNT(*) AS n_vecs
FROM v, UNNEST(generate_series(1, len(vec))) t(i)
GROUP BY label, t.i
ORDER BY label, pos
"""


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (64-token chunks, 16 overlap) —
    documents → context-window-sized training/retrieval units."""
    d = load(spark, sf_dir, "documents")
    return T.chunk_documents(d, "text", "doc_id", chunk_size=64, overlap=16).orderBy(
        "doc_id", "chunk_id"
    )


# stride = chunk_size - overlap = 48; DuckDB list slice is 1-based
# inclusive, so [s*48+1 : s*48+64] is exactly chunk s's 64 tokens.
# Last chunk = first one reaching the doc end: max(0, ceil((n-64)/48))
ORACLE_TEXT_CHUNKS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, ws,
         UNNEST(generate_series(0, CAST(GREATEST(CEIL((len(ws) - 64) / 48.0), 0) AS INT)))
           AS chunk_id
  FROM t
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(ws[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS INT) AS n_tokens,
       array_to_string(ws[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk
FROM c
ORDER BY doc_id, chunk_id
"""


def q_text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language mixture sampling: keep iff the
    60-bit md5(seed:id) uniform falls below the language's fraction —
    stable across runs/engines/order, never resamples old rows."""
    d = load(spark, sf_dir, "documents")
    return T.stratified_sample(
        d, "doc_id", "lang", {"en": 0.5, "de": 0.25, "fr": 0.1}, default_frac=0.05
    ).select("doc_id", "lang", "u", "sampled").orderBy("doc_id")


ORACLE_TEXT_STRATIFIED_SAMPLE = """
WITH h AS (
  SELECT doc_id, lang,
         ROUND((('0x' || substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
               / 1152921504606846976.0, 6) AS u
  FROM documents
)
SELECT doc_id, lang, u,
       u < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 WHEN 'fr' THEN 0.1
                     ELSE 0.05 END AS sampled
FROM h
ORDER BY doc_id
"""


def q_dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-dup overlap matrix over a corpus where the
    first 80 docs are re-ingested under two synthetic snapshot
    sources (40 shared between them) — the contamination check run
    before admitting a 'new' source. Everything shuffles as 32-byte
    digests; output is |sources|² at most."""
    d = load(spark, sf_dir, "documents")
    snap_a = d.where(F.col("doc_id") < 80).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text", F.lit("snap_a").alias("source")
    )
    snap_b = d.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 120)).select(
        (F.col("doc_id") + 40000).alias("doc_id"), "text", F.lit("snap_b").alias("source")
    )
    corpus = d.select("doc_id", "text", "source").unionAll(snap_a).unionAll(snap_b)
    return D.source_overlap(corpus, "text", "doc_id", "source").orderBy(
        "source_a", "source_b"
    )


ORACLE_DEDUP_SOURCE_OVERLAP = """
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 20000, text, 'snap_a' FROM documents WHERE doc_id < 80
  UNION ALL
  SELECT doc_id + 40000, text, 'snap_b' FROM documents WHERE doc_id >= 40 AND doc_id < 120
),
h AS (SELECT DISTINCT source AS src, md5(text) AS content_hash FROM corpus),
sizes AS (SELECT src, COUNT(*) AS n FROM h GROUP BY src),
shared AS (
  SELECT x.src AS source_a, y.src AS source_b, COUNT(*) AS n_shared
  FROM h x JOIN h y ON x.content_hash = y.content_hash AND x.src < y.src
  GROUP BY x.src, y.src
)
SELECT s.source_a, s.source_b, s.n_shared, a.n AS n_a, b.n AS n_b,
       (CAST((CASE WHEN (s.n_shared) < 0 THEN -(((((abs(CAST(s.n_shared AS BIGINT)) // (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100 + ((abs(CAST(s.n_shared AS BIGINT)) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) // (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100 + ((((abs(CAST(s.n_shared AS BIGINT)) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) // (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100 + ((((((abs(CAST(s.n_shared AS BIGINT)) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) // (CAST(a.n + b.n - s.n_shared AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(s.n_shared AS BIGINT)) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) >= (CAST(a.n + b.n - s.n_shared AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(s.n_shared AS BIGINT)) // (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100 + ((abs(CAST(s.n_shared AS BIGINT)) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) // (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100 + ((((abs(CAST(s.n_shared AS BIGINT)) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) // (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100 + ((((((abs(CAST(s.n_shared AS BIGINT)) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) // (CAST(a.n + b.n - s.n_shared AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(s.n_shared AS BIGINT)) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) * 100) % (CAST(a.n + b.n - s.n_shared AS BIGINT))) >= (CAST(a.n + b.n - s.n_shared AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS overlap_jaccard
FROM shared s
JOIN sizes a ON a.src = s.source_a
JOIN sizes b ON b.src = s.source_b
ORDER BY source_a, source_b
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: docs < 400 are the already-ingested
    corpus (digest index), docs >= 400 — plus 30 re-crawls of existing
    content — are the new batch. The admit list is the batch deduped
    against itself then anti-joined against the index; only digests
    ever shuffle, and at scale the index side is a bucketed table so
    the corpus text is read zero times per batch."""
    d = load(spark, sf_dir, "documents")
    idx = D.digest_index(d.where(F.col("doc_id") < 400), "text", "doc_id")
    recrawl = d.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 30000).alias("doc_id"), "text"
    )
    batch = d.where(F.col("doc_id") >= 400).select("doc_id", "text").unionAll(recrawl)
    return D.incremental_dedup(batch, "text", "doc_id", idx).orderBy("doc_id")


ORACLE_DEDUP_INCREMENTAL = """
WITH idx AS (
  SELECT DISTINCT md5(text) AS content_hash FROM documents WHERE doc_id < 400
),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 400
  UNION ALL
  SELECT doc_id + 30000, text FROM documents WHERE doc_id < 30
),
batch_first AS (
  SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id
  FROM batch GROUP BY md5(text)
)
SELECT b.doc_id, b.content_hash
FROM batch_first b
WHERE b.content_hash NOT IN (SELECT content_hash FROM idx)
ORDER BY doc_id
"""


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup — dedup at training-unit granularity,
    the composition RefinedWeb/FineWeb-style pipelines actually run:
    chunk_documents (64-token windows, 16 overlap) → exact_dedup over
    the chunk text. Boilerplate that repeats across documents (but
    never makes whole docs identical) collapses here. Both stages are
    the already-verified operators; the shuffle still carries 32-byte
    digests keyed by a synthetic bigint unit id."""
    d = load(spark, sf_dir, "documents")
    chunks = T.chunk_documents(d, "text", "doc_id", chunk_size=64, overlap=16)
    keyed = chunks.select(
        (F.col("doc_id") * F.lit(100000) + F.col("chunk_id")).alias("unit_id"), "chunk"
    )
    return D.exact_dedup(keyed, "chunk", "unit_id").orderBy("content_hash")


# chunk expansion mirrors ORACLE_TEXT_CHUNKS (stride 48, cap at the
# first chunk reaching the doc end); unit_id = doc_id*100000 + chunk_id
ORACLE_CHUNK_DEDUP = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, ws,
         UNNEST(generate_series(0, CAST(GREATEST(CEIL((len(ws) - 64) / 48.0), 0) AS INT)))
           AS chunk_id
  FROM t
),
units AS (
  SELECT doc_id * 100000 + chunk_id AS unit_id,
         array_to_string(ws[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk
  FROM c
)
SELECT md5(chunk) AS content_hash,
       MIN(unit_id) AS keep_id,
       COUNT(*) AS n_copies
FROM units
GROUP BY md5(chunk)
ORDER BY content_hash
"""


def q_curate_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: cap every source at 60 documents, survivors
    chosen by deterministic md5 rank so the oracle replays the exact
    kept set. Summarised per source (n kept + rank-1 doc) so the
    result is a compact, order-stable matrix."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    capped = T.source_cap(d, "doc_id", "source", cap=60)
    return (
        capped.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.min(F.when(F.col("cap_rank") == 1, F.col("doc_id"))).alias("rank1_doc"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


ORACLE_CURATE_SOURCE_CAP = """
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('cap1:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS cap_rank
  FROM documents
),
kept AS (SELECT * FROM ranked WHERE cap_rank <= 60)
SELECT source, COUNT(*) AS n_kept,
       MIN(CASE WHEN cap_rank = 1 THEN doc_id END) AS rank1_doc,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM kept GROUP BY source ORDER BY source
"""


def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM scoring of every document against the
    corpus's own top-200 add-one-smoothed unigram distribution."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return T.unigram_logprob(d, "text", "doc_id", vocab_size=200).orderBy("doc_id")


ORACLE_TEXT_UNIGRAM_LOGPROB = """
WITH terms AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(text, ' +')) t(term)
  WHERE t.term != ''
),
vocab AS (
  SELECT term, COUNT(*) AS c FROM terms GROUP BY term
  ORDER BY c DESC, term LIMIT 200
),
tot AS (
  SELECT (SELECT COUNT(*) FROM terms) AS n_words_corpus,
         (SELECT COUNT(*) FROM vocab) AS v
)
SELECT t.doc_id, COUNT(*) AS n_words,
       ROUND(AVG(LOG10(CAST(COALESCE(vc.c, 0) + 1 AS DOUBLE)
                       / (tot.n_words_corpus + tot.v + 1))), 5) AS mean_logprob
FROM terms t
LEFT JOIN vocab vc USING (term)
CROSS JOIN tot
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


def q_dedup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup summary: per document, how much of it is
    covered by 5-gram spans that also appear in other documents. The
    per-doc totals come straight off the documents scan (n_spans is a
    pure column expression), so only flagged spans aggregate."""
    d = load(spark, sf_dir, "documents")
    spans = D.duplicate_ngram_spans(d, "text", "doc_id", n=5, min_docs=2)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_flagged"),
        F.max("n_docs").alias("max_gram_docs"),
        F.min("pos").alias("first_flagged_pos"),
    )
    totals = d.select(
        "doc_id",
        F.greatest(F.size(F.split(F.col("text"), " ")) - 4, F.lit(0)).alias("n_spans"),
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
            round_ratio(
                F.coalesce("n_flagged", F.lit(0)), F.greatest("n_spans", F.lit(1)), 6
            ).alias("dup_span_frac"),
            F.coalesce("max_gram_docs", F.lit(0)).alias("max_gram_docs"),
            F.coalesce("first_flagged_pos", F.lit(-1)).alias("first_flagged_pos"),
        )
        .orderBy("doc_id")
    )


ORACLE_DEDUP_NGRAM_SPANS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, t.i AS pos, array_to_string(ws[t.i + 1 : t.i + 5], ' ') AS gram
  FROM w, UNNEST(generate_series(0, len(ws) - 5)) t(i)
  WHERE len(ws) >= 5
),
h AS (
  SELECT doc_id, pos, gram,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gram_hash FROM g
),
-- exact doc-frequency by the gram STRING (the r9 verify pass makes
-- the Spark side string-exact, so the oracle counts strings too; on
-- collision-free fixtures this equals the old hash-keyed count)
c AS (SELECT gram, COUNT(DISTINCT doc_id) AS n_docs FROM h GROUP BY gram),
f AS (
  SELECT h.doc_id, h.pos, c.n_docs FROM h JOIN c USING (gram) WHERE c.n_docs >= 2
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_flagged, MAX(n_docs) AS max_gram_docs,
         MIN(pos) AS first_flagged_pos
  FROM f GROUP BY doc_id
),
totals AS (
  SELECT doc_id, GREATEST(len(ws) - 4, 0) AS n_spans FROM w
)
SELECT t.doc_id, t.n_spans,
       COALESCE(p.n_flagged, 0) AS n_flagged,
       (CAST((CASE WHEN (COALESCE(p.n_flagged, 0)) < 0 THEN -(((((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) >= (CAST(GREATEST(t.n_spans, 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(p.n_flagged, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) >= (CAST(GREATEST(t.n_spans, 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0)
         AS dup_span_frac,
       COALESCE(p.max_gram_docs, 0) AS max_gram_docs,
       COALESCE(p.first_flagged_pos, -1) AS first_flagged_pos
FROM totals t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
"""


def q_text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail stratification of the corpus by
    unigram-LM score, exact tercile cut points."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return T.ccnet_buckets(d, "text", "doc_id", vocab_size=200).orderBy("doc_id")


ORACLE_TEXT_CCNET_BUCKETS = """
WITH terms AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(text, ' +')) t(term)
  WHERE t.term != ''
),
vocab AS (
  SELECT term, COUNT(*) AS c FROM terms GROUP BY term
  ORDER BY c DESC, term LIMIT 200
),
tot AS (
  SELECT (SELECT COUNT(*) FROM terms) AS n_words_corpus,
         (SELECT COUNT(*) FROM vocab) AS v
),
scored AS (
  SELECT t.doc_id,
         ROUND(AVG(LOG10(CAST(COALESCE(vc.c, 0) + 1 AS DOUBLE)
                         / (tot.n_words_corpus + tot.v + 1))), 5) AS mean_logprob
  FROM terms t
  LEFT JOIN vocab vc USING (term)
  CROSS JOIN tot
  GROUP BY t.doc_id
),
th AS (
  SELECT ROUND(PERCENTILE_CONT(1.0/3) WITHIN GROUP (ORDER BY mean_logprob), 4) AS t_lo,
         ROUND(PERCENTILE_CONT(2.0/3) WITHIN GROUP (ORDER BY mean_logprob), 4) AS t_hi
  FROM scored
)
SELECT s.doc_id, s.mean_logprob,
       CASE WHEN s.mean_logprob >= th.t_hi THEN 'head'
            WHEN s.mean_logprob >= th.t_lo THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s CROSS JOIN th
ORDER BY s.doc_id
"""


def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document (smoothed idf, rounded-score
    deterministic ranking)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        T.tfidf_keywords(d, "text", "doc_id", top_k=3)
        .select("doc_id", "rank", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "rank")
    )


ORACLE_TEXT_TFIDF_KEYWORDS = """
WITH terms AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(text, ' +')) t(term)
  WHERE t.term != ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ROUND(tf.tf * (LN((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
  ) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tf, df, tfidf
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization, summarized to scalar columns for
    the driver comparator (per-vector scale + quantized checksums)."""
    e = load(spark, sf_dir, "embeddings")
    q = S.quantize_embeddings(e, "embedding", "vec_id")
    zero = F.lit(0).cast("long")
    return q.select(
        "vec_id",
        "scale",
        F.aggregate("qvec", zero, lambda a, x: a + x).alias("sum_q"),
        F.aggregate("qvec", zero, lambda a, x: a + x * x).alias("sum_q2"),
        F.element_at("qvec", 1).cast("bigint").alias("q_first"),
        F.element_at("qvec", -1).cast("bigint").alias("q_last"),
    ).orderBy("vec_id")


ORACLE_EMB_QUANTIZE = """
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
  FROM embeddings
),
qq AS (
  SELECT vec_id, s,
         CASE WHEN s > 0
              THEN list_transform(xs, x -> CAST(ROUND(127.0 * x / s) AS BIGINT))
              ELSE list_transform(xs, x -> CAST(0 AS BIGINT)) END AS qv
  FROM q
)
SELECT vec_id, ROUND(s, 6) AS scale,
       CAST(list_sum(qv) AS BIGINT) AS sum_q,
       CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS sum_q2,
       qv[1] AS q_first,
       qv[len(qv)] AS q_last
FROM qq
ORDER BY vec_id
"""


def q_dedup_incremental_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy incremental ingest: docs < 400 are the indexed corpus;
    the new batch is docs >= 400 plus 30 exact re-crawls and 30
    first-word-truncated near-dups of corpus content. The batch's LSH
    band rows probe the corpus band index; similarity is the MinHash
    signature-agreement estimate — corpus text is never rescanned."""
    d = load(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") < 400).select("doc_id", "text")
    # r17 (guide §2.4): the in-query composition builds band rows that
    # CARRY the corpus signature (keep=["mins"]), so incremental_
    # neardup verifies in-row off the probe join — no separate verify
    # join, and the signature subtree has exactly one consumer, which
    # also removes minhash_index's eager checkpoint job (the corpus is
    # hashed once per run by construction). The persisted-index path
    # (write_minhash_index + bucketed probe) is untouched. Interleaved
    # A/B at sf0.1: 2.25 -> 2.14 s median (plus one job fewer per run;
    # the corpus here is 400 docs, so the removed verify join is small
    # at bench scale — the win is the shape).
    sigs = D.minhash_sig_array(corpus, "text", "doc_id")
    bands = D.bands_from_sig_array(sigs, keep=["mins"])
    ws = F.split(F.col("text"), " ")
    exact_dup = d.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text"
    )
    near_dup = d.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 60)).select(
        (F.col("doc_id") + 60000).alias("doc_id"),
        F.concat_ws(" ", F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0)))).alias("text"),
    )
    batch = (
        d.where(F.col("doc_id") >= 400).select("doc_id", "text")
        .unionAll(exact_dup)
        .unionAll(near_dup)
    )
    return D.incremental_neardup(
        batch, "text", "doc_id", bands, sigs, threshold=0.5
    ).orderBy("batch_id", "corpus_id")


ORACLE_DEDUP_INCREMENTAL_FUZZY = f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 400
  UNION ALL
  SELECT doc_id + 50000, text FROM documents WHERE doc_id < 30
  UNION ALL
  SELECT doc_id + 60000,
         array_to_string((string_split(text, ' '))[2 : len(string_split(text, ' '))], ' ')
  FROM documents WHERE doc_id >= 30 AND doc_id < 60
),
all_docs AS (
  SELECT doc_id, text, 'c' AS side FROM corpus
  UNION ALL
  SELECT doc_id, text, 'b' AS side FROM batch
),
words AS (SELECT doc_id, side, string_split(text, ' ') AS ws FROM all_docs),
sh_all AS (
  SELECT w.doc_id, w.side, array_to_string(w.ws[t.i + 1 : t.i + 3], ' ') AS shingle
  FROM words w, UNNEST(generate_series(0, greatest(len(w.ws) - 3, 0))) t(i)
),
sh AS (SELECT DISTINCT doc_id, side, shingle FROM sh_all),
hashed AS (
  SELECT doc_id, side, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0 FROM sh
),
params(i, a, b) AS (VALUES {{params}}),
sigs AS (
  SELECT h.doc_id, h.side, p.i, MIN((p.a * h.h0 + p.b) % {D.MINHASH_P}) AS minhash
  FROM hashed h CROSS JOIN params p
  GROUP BY h.doc_id, h.side, p.i
),
bands AS (
  SELECT doc_id, side, CAST(i // {D.MINHASH_N // D.MINHASH_BANDS} AS INT) AS band,
         md5(array_to_string(list_sort(list(printf('%d:%d', i, minhash))), ',')) AS band_hash
  FROM sigs GROUP BY doc_id, side, band
),
cand AS (
  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
  FROM bands b
  JOIN bands c ON b.band = c.band AND b.band_hash = c.band_hash
  WHERE b.side = 'b' AND c.side = 'c'
),
est AS (
  SELECT cand.batch_id, cand.corpus_id,
         ROUND(SUM(CASE WHEN sb.minhash = sc.minhash THEN 1 ELSE 0 END)
               / {float(D.MINHASH_N)}, 6) AS est_jaccard
  FROM cand
  JOIN sigs sb ON sb.doc_id = cand.batch_id AND sb.side = 'b'
  JOIN sigs sc ON sc.doc_id = cand.corpus_id AND sc.side = 'c' AND sc.i = sb.i
  GROUP BY cand.batch_id, cand.corpus_id
)
SELECT batch_id, corpus_id, est_jaccard
FROM est WHERE est_jaccard >= 0.5
ORDER BY batch_id, corpus_id
""".replace("{params}", _params_values())


def q_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-batch prep at chunk granularity: documents chunked to
    64-token windows (stride 48), chunks keyed per training unit and
    packed per source into ~256-token bins — the composed
    chunk-then-pack pipeline a pretraining dataloader consumes. Both
    halves are the already-verified operators; the bin assignment is
    the cumulative-window formulation, so the oracle replays it."""
    d = load(spark, sf_dir, "documents")
    # r16 (guide §2.4): `source` rides through the chunker (keep=)
    # instead of a second documents scan + rejoin on doc_id
    chunks = T.chunk_documents(
        d, "text", "doc_id", chunk_size=64, overlap=16, keep=["source"]
    )
    units = chunks.select(
        (F.col("doc_id") * F.lit(100000) + F.col("chunk_id")).alias("unit_id"),
        "chunk",
        "source",
    )
    return T.pack_sequences(units, "chunk", "unit_id", "source", token_budget=256).orderBy(
        "grp", "bin"
    )


ORACLE_CHUNK_PACK = """
WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, source, ws,
         UNNEST(generate_series(0, CAST(GREATEST(CEIL((len(ws) - 64) / 48.0), 0) AS INT)))
           AS chunk_id
  FROM t
),
units AS (
  SELECT source AS grp, doc_id * 100000 + chunk_id AS doc,
         len(ws[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS n_tokens
  FROM c
),
b AS (
  SELECT grp, doc, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY grp ORDER BY doc
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                    / 256.0) AS BIGINT) AS bin
  FROM units
)
SELECT grp, bin, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc) AS first_doc, MAX(doc) AS last_doc
FROM b GROUP BY grp, bin ORDER BY grp, bin
"""


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data profile of the documents table — the first thing
    a pipeline runs on a new corpus drop."""
    from easydb_server_spark.operators.profile import profile_table

    d = load(spark, sf_dir, "documents")
    return profile_table(d, ["doc_id", "lang", "source", "n_chars"]).orderBy("column")


ORACLE_PROFILE_DOCUMENTS = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM documents),
per AS (
  SELECT 'doc_id' AS column, COUNT(*) - COUNT(doc_id) AS n_null,
         COUNT(DISTINCT doc_id) AS n_distinct,
         CAST(MIN(doc_id) AS VARCHAR) AS min_value, CAST(MAX(doc_id) AS VARCHAR) AS max_value
  FROM documents
  UNION ALL
  SELECT 'lang', COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
         MIN(lang), MAX(lang) FROM documents
  UNION ALL
  SELECT 'source', COUNT(*) - COUNT(source), COUNT(DISTINCT source),
         MIN(source), MAX(source) FROM documents
  UNION ALL
  SELECT 'n_chars', COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
         CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
)
SELECT per.column, n.n_rows, per.n_null,
       {null_rate} AS null_rate,
       per.n_distinct, per.min_value, per.max_value
FROM per, n
ORDER BY per.column
""".format(null_rate=round_div_sql("per.n_null", "GREATEST(n.n_rows, 1)", 6, "duckdb"))


def q_quality_gate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative ingestion gate over the events table: five rules
    evaluated in one scan; NULL predicate results count as violations
    (the strict reading)."""
    from easydb_server_spark.operators.profile import quality_checks

    e = load(spark, sf_dir, "events")
    rules = [
        ("event_id_present", "event_id IS NOT NULL"),
        ("user_nonnegative", "user_id >= 0"),
        ("known_event_type", "event_type IN ('view','click','purchase','signup','error')"),
        ("value_in_range", "value >= -1000 AND value <= 100000"),
        ("ts_in_window", "ts >= TIMESTAMP '2020-01-01 00:00:00'"),
    ]
    return quality_checks(e, rules).orderBy("rule")


ORACLE_QUALITY_GATE_EVENTS = """
WITH checks(rule, predicate) AS (
  VALUES
    ('event_id_present', 'event_id IS NOT NULL'),
    ('user_nonnegative', 'user_id >= 0'),
    ('known_event_type', 'event_type IN (''view'',''click'',''purchase'',''signup'',''error'')'),
    ('value_in_range', 'value >= -1000 AND value <= 100000'),
    ('ts_in_window', 'ts >= TIMESTAMP ''2020-01-01 00:00:00''')
),
v AS (
  SELECT 'event_id_present' AS rule,
         CAST(SUM(CASE WHEN event_id IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
  FROM events
  UNION ALL
  SELECT 'user_nonnegative',
         CAST(SUM(CASE WHEN user_id >= 0 THEN 0 ELSE 1 END) AS BIGINT) FROM events
  UNION ALL
  SELECT 'known_event_type',
         CAST(SUM(CASE WHEN event_type IN ('view','click','purchase','signup','error')
                       THEN 0 ELSE 1 END) AS BIGINT) FROM events
  UNION ALL
  SELECT 'value_in_range',
         CAST(SUM(CASE WHEN value >= -1000 AND value <= 100000 THEN 0 ELSE 1 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'ts_in_window',
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2020-01-01 00:00:00' THEN 0 ELSE 1 END) AS BIGINT)
  FROM events
)
SELECT c.rule, c.predicate, v.n_violations, v.n_violations = 0 AS passed
FROM checks c JOIN v USING (rule)
ORDER BY c.rule
"""


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift report between the first and second halves of the
    documents corpus (standing in for reference vs new snapshot),
    with nulls injected into the candidate's lang column so the
    null-rate jump trips the gate."""
    from easydb_server_spark.operators.profile import profile_drift

    d = load(spark, sf_dir, "documents")
    mid = 250
    ref = d.where(F.col("doc_id") < mid)
    cand = d.where(F.col("doc_id") >= mid).withColumn(
        "lang", F.when(F.col("doc_id") % 10 == 0, None).otherwise(F.col("lang"))
    )
    return profile_drift(ref, cand, ["lang", "source", "n_chars"]).orderBy("column")


ORACLE_PROFILE_DRIFT = """
WITH ref AS (SELECT * FROM documents WHERE doc_id < 250),
cand AS (
  SELECT doc_id, CASE WHEN doc_id % 10 = 0 THEN NULL ELSE lang END AS lang,
         source, n_chars
  FROM documents WHERE doc_id >= 250
),
rp AS (
  SELECT 'lang' AS column, (CAST((CASE WHEN (nn) < 0 THEN -(((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS nr, dct, nrw
  FROM (SELECT COUNT(*) - COUNT(lang) AS nn, GREATEST(COUNT(*), 1) AS nd,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS dct,
               CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS nrw
        FROM ref)
  UNION ALL
  SELECT 'source' AS column, (CAST((CASE WHEN (nn) < 0 THEN -(((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS nr, dct, nrw
  FROM (SELECT COUNT(*) - COUNT(source) AS nn, GREATEST(COUNT(*), 1) AS nd,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS dct,
               CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS nrw
        FROM ref)
  UNION ALL
  SELECT 'n_chars' AS column, (CAST((CASE WHEN (nn) < 0 THEN -(((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS nr, dct, nrw
  FROM (SELECT COUNT(*) - COUNT(n_chars) AS nn, GREATEST(COUNT(*), 1) AS nd,
               CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS dct,
               CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS nrw
        FROM ref)
),
cp AS (
  SELECT 'lang' AS column, (CAST((CASE WHEN (nn) < 0 THEN -(((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS nr, dct, nrw
  FROM (SELECT COUNT(*) - COUNT(lang) AS nn, GREATEST(COUNT(*), 1) AS nd,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS dct,
               CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS nrw
        FROM cand)
  UNION ALL
  SELECT 'source' AS column, (CAST((CASE WHEN (nn) < 0 THEN -(((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS nr, dct, nrw
  FROM (SELECT COUNT(*) - COUNT(source) AS nn, GREATEST(COUNT(*), 1) AS nd,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS dct,
               CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS nrw
        FROM cand)
  UNION ALL
  SELECT 'n_chars' AS column, (CAST((CASE WHEN (nn) < 0 THEN -(((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(nn AS BIGINT)) // (CAST(nd AS BIGINT))) * 100 + ((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) * 100 + ((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) // (CAST(nd AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(nn AS BIGINT)) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) * 100) % (CAST(nd AS BIGINT))) >= (CAST(nd AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS nr, dct, nrw
  FROM (SELECT COUNT(*) - COUNT(n_chars) AS nn, GREATEST(COUNT(*), 1) AS nd,
               CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS dct,
               CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS nrw
        FROM cand)
)
SELECT rp."column", rp.nr AS ref_null_rate, cp.nr AS cand_null_rate,
       ROUND(cp.nr - rp.nr, 6) AS null_rate_increase,
       CASE WHEN rp.dct > 0 THEN (CAST((CASE WHEN (ABS(cp.dct * rp.nrw - rp.dct * cp.nrw)) < 0 THEN -(((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) >= (CAST(cp.nrw * rp.dct AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) >= (CAST(cp.nrw * rp.dct AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) ELSE ROUND(ABS(CAST(cp.dct AS DOUBLE) / cp.nrw - CAST(rp.dct AS DOUBLE) / rp.nrw) / 1e-12, 6) END AS distinct_density_change,
       ROUND(cp.nr - rp.nr, 6) <= 0.05
         AND CASE WHEN rp.dct > 0 THEN (CAST((CASE WHEN (ABS(cp.dct * rp.nrw - rp.dct * cp.nrw)) < 0 THEN -(((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) >= (CAST(cp.nrw * rp.dct AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) * 100 + ((((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) // (CAST(cp.nrw * rp.dct AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(ABS(cp.dct * rp.nrw - rp.dct * cp.nrw) AS BIGINT)) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) * 100) % (CAST(cp.nrw * rp.dct AS BIGINT))) >= (CAST(cp.nrw * rp.dct AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) ELSE ROUND(ABS(CAST(cp.dct AS DOUBLE) / cp.nrw - CAST(rp.dct AS DOUBLE) / rp.nrw) / 1e-12, 6) END <= 0.5 AS ok
FROM rp JOIN cp USING ("column")
ORDER BY rp."column"
"""


# ---------- span-level decontamination + SemDeDup (round 7) ----------


def q_text_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination (GPT-3 App. C / PaLM):
    per training doc, which 3-gram positions overlap the src0 eval
    set — the clip-don't-drop alternative to text_decontaminate."""
    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("source") == "src0")
    train = d.where(F.col("source") != "src0")
    spans = D.contamination_spans(train, bench, "text", "doc_id", n=3)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_contam"),
        F.min("pos").alias("first_pos"),
        F.max("pos").alias("last_pos"),
    )
    totals = train.select(
        "doc_id",
        F.greatest(F.size(F.split(F.col("text"), " ")) - 2, F.lit(0)).alias("n_spans"),
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_contam", F.lit(0)).alias("n_contam"),
            round_ratio(
                F.coalesce("n_contam", F.lit(0)), F.greatest("n_spans", F.lit(1)), 6
            ).alias("contam_frac"),
            F.coalesce("first_pos", F.lit(-1)).alias("first_pos"),
            F.coalesce("last_pos", F.lit(-1)).alias("last_pos"),
        )
        .orderBy("doc_id")
    )


ORACLE_TEXT_CONTAMINATION_SPANS = """
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, source, t.i AS pos, array_to_string(ws[t.i + 1 : t.i + 3], ' ') AS gram
  FROM w, UNNEST(generate_series(0, len(ws) - 3)) t(i)
  WHERE len(ws) >= 3
),
h AS (
  SELECT doc_id, source, pos,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gram_hash
  FROM g
),
bench AS (SELECT DISTINCT gram_hash FROM h WHERE source = 'src0'),
f AS (
  SELECT h.doc_id, h.pos FROM h JOIN bench USING (gram_hash)
  WHERE h.source != 'src0'
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_contam, MIN(pos) AS first_pos, MAX(pos) AS last_pos
  FROM f GROUP BY doc_id
),
totals AS (
  SELECT doc_id, GREATEST(len(ws) - 2, 0) AS n_spans FROM w WHERE source != 'src0'
)
SELECT t.doc_id, t.n_spans,
       COALESCE(p.n_contam, 0) AS n_contam,
       (CAST((CASE WHEN (COALESCE(p.n_contam, 0)) < 0 THEN -(((((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) >= (CAST(GREATEST(t.n_spans, 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) // (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(p.n_contam, 0) AS BIGINT)) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) * 100) % (CAST(GREATEST(t.n_spans, 1) AS BIGINT))) >= (CAST(GREATEST(t.n_spans, 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0)
         AS contam_frac,
       COALESCE(p.first_pos, -1) AS first_pos,
       COALESCE(p.last_pos, -1) AS last_pos
FROM totals t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
"""


def q_sim_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over a dup-injected embedding corpus: k-means cells →
    within-cell cosine ≥ 0.9 → keep the smallest id per dup set.
    Injected exact copies land in their originals' cells (identical
    dot products, deterministic tie-break), so recall on true dups is
    exercised; oracle replays the deterministic k-means."""
    e = load(spark, sf_dir, "embeddings")
    dups = e.where(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = e.select("vec_id", "embedding").unionAll(dups)
    return S.semdedup(corpus, "embedding", "vec_id", n_cells=16, threshold=0.9).orderBy(
        "vec_id"
    )


ORACLE_SIM_SEMDEDUP = """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
v AS (
  SELECT vec_id, vec FROM base
  UNION ALL
  SELECT vec_id + 10000, vec FROM base WHERE vec_id < 30
),
init AS (
  SELECT vec_id AS cell, vec AS centroid FROM v
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
a0 AS (
  SELECT cid, cell FROM (
    SELECT v.vec_id AS cid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_dot_product(v.vec, c.centroid), 6) DESC, c.cell) AS r
    FROM v CROSS JOIN init c
  ) WHERE r = 1
),
upd AS (
  SELECT a0.cell, t.i AS pos, ROUND(AVG(v.vec[t.i]), 5) AS m
  FROM a0 JOIN v ON v.vec_id = a0.cid,
       UNNEST(generate_series(1, len(v.vec))) t(i)
  GROUP BY a0.cell, t.i
),
newc AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM upd GROUP BY cell),
cents AS (
  SELECT i.cell, COALESCE(n.centroid, i.centroid) AS centroid
  FROM init i LEFT JOIN newc n ON n.cell = i.cell
),
assigned AS (
  SELECT cid, cell FROM (
    SELECT v.vec_id AS cid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_dot_product(v.vec, c.centroid), 6) DESC, c.cell) AS r
    FROM v CROSS JOIN cents c
  ) WHERE r = 1
),
drops AS (
  SELECT DISTINCT x.cid
  FROM assigned x
  JOIN assigned y ON x.cell = y.cell AND y.cid < x.cid
  JOIN v xv ON xv.vec_id = x.cid
  JOIN v yv ON yv.vec_id = y.cid
  WHERE ROUND(list_cosine_similarity(xv.vec, yv.vec), 6) >= 0.9
)
SELECT a.cid AS vec_id, a.cell, (d.cid IS NULL) AS keep
FROM assigned a LEFT JOIN drops d ON d.cid = a.cid
ORDER BY vec_id
"""


def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training: the first 6 merges learned from the
    corpus word histogram (driver-superstep loop; greedy left-to-right
    merge as an in-row fold). Oracle replays all 6 supersteps as an
    unrolled CTE pipeline with gaps-and-islands parity for the
    overlapping-run case."""
    d = load(spark, sf_dir, "documents")
    return T.bpe_merges(d, "text", n_merges=6).orderBy("rank")


def _oracle_bpe(n_merges: int) -> str:
    stages = []
    for k in range(n_merges):
        stages.append(
            f"""p{k} AS (
  SELECT syms[t.i] AS l, syms[t.i + 1] AS r, CAST(SUM(wc) AS BIGINT) AS cnt
  FROM v{k}, UNNEST(generate_series(1, len(syms) - 1)) t(i)
  WHERE len(syms) >= 2
  GROUP BY 1, 2
),
t{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
e{k} AS (
  SELECT v.word, v.wc, u.i AS i, v.syms[u.i] AS sym,
         (u.i < len(v.syms) AND v.syms[u.i] = tk.l AND v.syms[u.i + 1] = tk.r) AS m
  FROM v{k} v CROSS JOIN t{k} tk, UNNEST(generate_series(1, len(v.syms))) u(i)
),
g{k} AS (
  SELECT *, i - ROW_NUMBER() OVER (PARTITION BY word, m ORDER BY i) AS isl FROM e{k}
),
s{k} AS (
  SELECT *, (m AND (i - MIN(i) OVER (PARTITION BY word, m, isl)) % 2 = 0) AS st
  FROM g{k}
),
c{k} AS (
  SELECT *, COALESCE(LAG(st) OVER (PARTITION BY word ORDER BY i), FALSE) AS consumed
  FROM s{k}
),
v{k + 1} AS (
  SELECT c.word, c.wc,
         list(CASE WHEN c.st THEN tk.l || tk.r ELSE c.sym END ORDER BY c.i) AS syms
  FROM c{k} c CROSS JOIN t{k} tk
  WHERE NOT c.consumed
  GROUP BY c.word, c.wc
)"""
        )
    finals = "\nUNION ALL\n".join(
        f'SELECT {k} AS rank, l AS "left", r AS "right", l || r AS merged, cnt AS pair_count FROM t{k}'
        for k in range(n_merges)
    )
    return (
        """WITH v0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wc,
         list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
  WHERE word != ''
  GROUP BY word
),
"""
        + ",\n".join(stages)
        + "\nSELECT * FROM (\n"
        + finals
        + "\n) ORDER BY rank"
    )


ORACLE_TEXT_BPE_MERGES = _oracle_bpe(6)


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-15 for the keyword query {customer, join, vector}.
    Every score input is an integer (tf/df/N/dl and the exact long sum
    behind avgdl) and the float expression applies in one fixed order,
    so the DuckDB oracle is bit-identical."""
    d = load(spark, sf_dir, "documents")
    return T.bm25_rank(d, "text", "doc_id", ["customer", "join", "vector"], topk=15)


def _bm25_score_sql(terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """The BM25 score expression, ONE copy — the repr-interpolated
    float constants are what keep Spark and DuckDB bit-identical, so
    every oracle (text_bm25, sim_hybrid_rrf, the fuzz test) must build
    from here."""
    k1p1, one_minus_b = repr(k1 + 1.0), repr(1.0 - b)
    return "\n   + ".join(
        f"ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) * "
        f"(tf{i} * {k1p1} / (tf{i} + {repr(k1)} * ({one_minus_b} + {repr(b)} * dl / (sum_dl / n_docs))))"
        for i in range(len(terms))
    )


def _oracle_bm25(terms: list[str], k1: float = 1.2, b: float = 0.75, topk: int = 15) -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(ws, w -> w = '{t}')) AS tf{i}" for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    score = _bm25_score_sql(terms, k1, b)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
base AS (
  SELECT doc_id, len(ws) AS dl,
         {tf_cols}
  FROM d
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM base
)
SELECT doc_id, dl,
       ROUND({score}, 6) AS score
FROM base CROSS JOIN stats
ORDER BY score DESC, doc_id LIMIT {topk}
"""


ORACLE_TEXT_BM25 = _oracle_bm25(["customer", "join", "vector"])


def q_sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 (lexical) fused with exact-cosine
    top-50 of query vector 42 (dense) by reciprocal-rank fusion —
    the standard RAG retrieval shape; doc_id and vec_id share the id
    space by fixture construction."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    lex = T.bm25_rank(d, "text", "doc_id", ["customer", "join", "vector"], topk=50)
    wl = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    lex_ranks = lex.select("doc_id", F.row_number().over(wl).alias("rank")).withColumnRenamed(
        "doc_id", "id"
    )
    q = e.where(F.col("vec_id") == 42)
    dense = S.topk_cosine_bruteforce(e, q, "embedding", "vec_id", k=50)
    dense_ranks = dense.select(F.col("cid").alias("id"), "rank")
    return S.rrf_fuse([lex_ranks, dense_ranks], topk=10)


def _oracle_hybrid(terms: list[str]) -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(ws, w -> w = '{t}')) AS tf{i}" for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
base AS (
  SELECT doc_id, len(ws) AS dl,
         {tf_cols}
  FROM d
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM base
),
lex AS (
  SELECT doc_id,
       ROUND({_bm25_score_sql(terms)}, 6) AS score
  FROM base CROSS JOIN stats
  ORDER BY score DESC, doc_id LIMIT 50
),
lex_ranks AS (
  SELECT doc_id AS id,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS r0
  FROM lex
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
qv AS (SELECT * FROM v WHERE vec_id = 42),
dscored AS (
  SELECT c.vec_id AS cid, ROUND(list_cosine_similarity(c.vec, qv.vec), 6) AS cosine
  FROM v c CROSS JOIN qv WHERE c.vec_id != qv.vec_id
),
dense_ranks AS (
  SELECT cid AS id, CAST(rank AS INT) AS r1 FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, cid) AS rank FROM dscored
  ) WHERE rank <= 50
),
fused AS (
  SELECT COALESCE(l.id, d.id) AS id, l.r0, d.r1
  FROM lex_ranks l FULL OUTER JOIN dense_ranks d ON l.id = d.id
)
SELECT id, COALESCE(r0, -1) AS rank_0, COALESCE(r1, -1) AS rank_1,
       ROUND(COALESCE(1.0 / (60 + r0), 0.0) + COALESCE(1.0 / (60 + r1), 0.0), 6) AS rrf
FROM fused
ORDER BY rrf DESC, id LIMIT 10
"""


ORACLE_SIM_HYBRID_RRF = _oracle_hybrid(["customer", "join", "vector"])


def q_text_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export manifest: deterministic shard assignment
    (corpus_shuffle hash order) with per-shard doc/token counts and an
    order-insensitive content digest — the integrity artifact the
    shard writer (export.export_training_shards) emits."""
    d = load(spark, sf_dir, "documents")
    return T.shard_manifest(d, "text", "doc_id", n_shards=8, seed="v1").orderBy("shard")


ORACLE_TEXT_SHARD_MANIFEST = """
WITH base AS (
  SELECT CAST(CAST(('0x' || substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS INT) AS shard,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS text_h
  FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(text_h) AS BIGINT) AS content_digest
FROM base GROUP BY shard ORDER BY shard
"""


BPE_APPLY_MERGES = [("e", "r"), ("o", "r"), ("i", "n"), ("s", "t"), ("er", "s")]


def q_text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding with a fixed merge table (rank order, incl. a
    merged-token pair er+s): per-doc token counts after all merges —
    the tokenize step whose output feeds chunking/packing. Oracle
    replays every merge as an unrolled islands-parity rewrite stage."""
    d = load(spark, sf_dir, "documents")
    return T.bpe_apply(d, "text", "doc_id", BPE_APPLY_MERGES).orderBy("doc_id")


def _bpe_apply_stage(k: int, a: str, b: str) -> str:
    qa, qb = a.replace("'", "''"), b.replace("'", "''")
    return f"""e{k} AS (
  SELECT v.word, u.i AS i, v.syms[u.i] AS sym,
         (u.i < len(v.syms) AND v.syms[u.i] = '{qa}' AND v.syms[u.i + 1] = '{qb}') AS m
  FROM w{k} v, UNNEST(generate_series(1, len(v.syms))) u(i)
),
g{k} AS (
  SELECT *, i - ROW_NUMBER() OVER (PARTITION BY word, m ORDER BY i) AS isl FROM e{k}
),
s{k} AS (
  SELECT *, (m AND (i - MIN(i) OVER (PARTITION BY word, m, isl)) % 2 = 0) AS st
  FROM g{k}
),
c{k} AS (
  SELECT *, COALESCE(LAG(st) OVER (PARTITION BY word ORDER BY i), FALSE) AS consumed
  FROM s{k}
),
w{k + 1} AS (
  SELECT word, list(CASE WHEN st THEN '{qa}{qb}' ELSE sym END ORDER BY i) AS syms
  FROM c{k}
  WHERE NOT consumed
  GROUP BY word
)"""


def _oracle_bpe_apply(merges: list[tuple[str, str]]) -> str:
    stages = ",\n".join(_bpe_apply_stage(k, a, b) for k, (a, b) in enumerate(merges))
    n = len(merges)
    return f"""
WITH words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
),
words_ne AS (SELECT doc_id, word FROM words WHERE word != ''),
w0 AS (
  SELECT word, list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
  FROM (SELECT DISTINCT word FROM words_ne)
),
{stages},
enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS word_tokens FROM w{n})
SELECT d.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(length(d.word)) AS BIGINT) AS n_chars,
       CAST(SUM(e.word_tokens) AS BIGINT) AS n_tokens
FROM words_ne d JOIN enc e USING (word)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


ORACLE_TEXT_BPE_APPLY = _oracle_bpe_apply(BPE_APPLY_MERGES)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full batch curation flow in ONE plan — the composition a
    pre-training data run executes end to end: quality gate (composite
    ≥ 0.2, prunes the worst quartile) → exact dedup (min doc_id per
    md5) → benchmark decontamination vs the src0 eval set → 64/16
    token chunking → per-source chunk/token yield. Every stage is a
    verified operator; the composition inherits each stage's scale
    shape (scan-side gate, digest-width dedup shuffle, broadcast
    decontamination probe, zero-shuffle chunking, map-side-combinable
    final rollup)."""
    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("source") == "src0")
    train = d.where(F.col("source") != "src0")
    # r16 note: `gated`/`clean` each feed two consumers, so their
    # subtrees evaluate twice (Catalyst shares no subtrees). Pinning
    # them with lazy localCheckpoints was MEASURED SLOWER at sf0.1
    # (3.09 s vs 2.03 s median-of-5): materializing the corpus-width
    # intermediate plus its stage barrier costs more than re-running
    # the scan-side regex gate. Left re-derived deliberately.
    gated = T.quality_gate(train, "text", threshold=0.2)
    # r16 A/B note: computing the keep set over the UNGATED train
    # corpus (md5-equal texts gate identically, so group minima are
    # unchanged) looked like a free gate-elimination, but measured
    # 3.9 s vs 1.3 s against this form in a same-minute grid — the
    # separate train-side aggregate subtree defeats the planner's
    # scan-stage reuse under the broadcast anti probe. Keep the
    # gated-side dedup.
    keep = D.exact_dedup(gated, "text", "doc_id").select(F.col("keep_id").alias("doc_id"))
    # r17 (guide §2.4 — don't re-evaluate subtrees): decontaminate
    # probes GATED (pre-dedup) and the keep join applies ONCE after
    # the anti. Identical rows: contamination is a per-doc predicate
    # (a doc is dropped iff ITS OWN shingles hit the bench set), so it
    # commutes with the keep restriction, and the probe's extra
    # doc_ids (gated-but-not-kept) are removed by the inner keep join
    # anyway. The old form decontaminate(gated ⋈ keep) made Catalyst
    # evaluate the keep AGGREGATE twice (probe side + final side) and
    # the gate regex four times — plan: 5 scans → 4, keep-agg 2 → 1;
    # measured 2.99 → 1.59 s (median of 5, same session, rows equal).
    clean = T.decontaminate(gated, bench, "text", "doc_id").join(keep, "doc_id")
    # r16 (guide §2.4): `source` rides through the chunker instead of
    # re-joining `clean` — the join re-evaluated the whole gate →
    # dedup → decontaminate subtree a second time (Catalyst shares no
    # subtrees) plus a corpus-width SortMergeJoin; same rows, since
    # doc_id is unique in `clean` and the join only re-attached the
    # row's own source
    chunks = T.chunk_documents(
        clean, "text", "doc_id", chunk_size=64, overlap=16, keep=["source"]
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("source")
    )


def _oracle_curation_pipeline() -> str:
    stop = ", ".join(repr(w) for w in T.LANG_PROFILES["en"])
    return f"""
WITH q AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS ws,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS INT) AS n_punct
  FROM documents WHERE source != 'src0'
),
q2 AS (
  SELECT *, CAST(len(list_filter(ws, w -> list_contains([{stop}], w))) AS INT) AS n_stop
  FROM q
),
gated AS (
  SELECT doc_id, source, text, ws
  FROM (SELECT *, CAST(n_words AS BIGINT) * GREATEST(n_words, 1) * GREATEST(n_chars, 1) + 800 * CAST(n_stop AS BIGINT) * GREATEST(n_chars, 1) - 2000 * CAST(n_punct AS BIGINT) * GREATEST(n_words, 1) AS qnum, 400 * CAST(GREATEST(n_words, 1) AS BIGINT) * GREATEST(n_chars, 1) AS qden FROM q2)
  WHERE (CAST((CASE WHEN (qnum) < 0 THEN -(((((abs(CAST(qnum AS BIGINT)) // (CAST(qden AS BIGINT))) * 100 + ((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) >= (CAST(qden AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(qnum AS BIGINT)) // (CAST(qden AS BIGINT))) * 100 + ((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) >= (CAST(qden AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) >= 0.2
),
keep AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
dd AS (SELECT g.* FROM gated g JOIN keep USING (doc_id)),
dsh_all AS (
  SELECT doc_id, array_to_string(ws[t.i + 1 : t.i + 3], ' ') AS shingle
  FROM dd, UNNEST(generate_series(0, greatest(len(ws) - 3, 0))) t(i)
),
dsh AS (
  SELECT DISTINCT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM dsh_all
),
bw AS (SELECT string_split(text, ' ') AS ws FROM documents WHERE source = 'src0'),
bsh_all AS (
  SELECT array_to_string(ws[t.i + 1 : t.i + 3], ' ') AS shingle
  FROM bw, UNNEST(generate_series(0, greatest(len(ws) - 3, 0))) t(i)
),
bsh AS (SELECT DISTINCT CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h FROM bsh_all),
bad AS (SELECT DISTINCT s.doc_id FROM dsh s JOIN bsh USING (h)),
clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
c AS (
  SELECT doc_id, source, ws,
         UNNEST(generate_series(0, CAST(GREATEST(CEIL((len(ws) - 64) / 48.0), 0) AS INT)))
           AS chunk_id
  FROM clean
),
ch AS (SELECT source, CAST(len(ws[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS INT) AS n_tokens FROM c)
SELECT source, COUNT(*) AS n_chunks, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM ch GROUP BY source ORDER BY source
"""


ORACLE_CURATION_PIPELINE = _oracle_curation_pipeline()


def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM scoring (λ=0.7, add-one unigram
    backoff), self-trained on the corpus — the CCNet-style perplexity
    signal one model order up from text_unigram_logprob."""
    d = load(spark, sf_dir, "documents")
    return T.bigram_logprob(d, "text", "doc_id", lam=0.7).orderBy("doc_id")


def _oracle_bigram_logprob(lam: float = 0.7) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(text, ' +'), w -> w != '') AS ws
  FROM documents
),
toks AS (SELECT doc_id, UNNEST(ws) AS term FROM d),
uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cu FROM toks GROUP BY term),
tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_corpus, CAST(COUNT(*) AS BIGINT) AS v FROM uni),
pairs AS (
  SELECT doc_id, ws[t.i + 1] AS prev, ws[t.i + 2] AS w
  FROM d, UNNEST(generate_series(0, len(ws) - 2)) t(i)
  WHERE len(ws) >= 2
),
bi AS (SELECT prev, w, CAST(COUNT(*) AS BIGINT) AS cb FROM pairs GROUP BY prev, w)
SELECT p.doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(log10(
         {lam!r} * (b.cb / u1.cu)
         + {1.0 - lam!r} * ((u2.cu + 1) / (t.n_corpus + t.v + 1))
       )), 5) AS mean_logprob
FROM pairs p
JOIN bi b ON b.prev = p.prev AND b.w = p.w
JOIN uni u1 ON u1.term = p.prev
JOIN uni u2 ON u2.term = p.w
CROSS JOIN tot t
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


ORACLE_TEXT_BIGRAM_LOGPROB = _oracle_bigram_logprob(0.7)


def q_text_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-descending curriculum order: CCNet phase (head=0 →
    tail=2) + reproducible sharded hash order within each phase."""
    d = load(spark, sf_dir, "documents")
    return T.curriculum_order(d, "text", "doc_id", n_shards=4).orderBy("doc_id")


ORACLE_TEXT_CURRICULUM = """
WITH terms AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(text, ' +')) t(term)
  WHERE t.term != ''
),
vocab AS (
  SELECT term, COUNT(*) AS c FROM terms GROUP BY term
  ORDER BY c DESC, term LIMIT 200
),
tot AS (
  SELECT (SELECT COUNT(*) FROM terms) AS n_words_corpus,
         (SELECT COUNT(*) FROM vocab) AS v
),
scored AS (
  SELECT t.doc_id,
         ROUND(AVG(LOG10(CAST(COALESCE(vc.c, 0) + 1 AS DOUBLE)
                         / (tot.n_words_corpus + tot.v + 1))), 5) AS mean_logprob
  FROM terms t
  LEFT JOIN vocab vc USING (term)
  CROSS JOIN tot
  GROUP BY t.doc_id
),
th AS (
  SELECT ROUND(PERCENTILE_CONT(1.0/3) WITHIN GROUP (ORDER BY mean_logprob), 4) AS t_lo,
         ROUND(PERCENTILE_CONT(2.0/3) WITHIN GROUP (ORDER BY mean_logprob), 4) AS t_hi
  FROM scored
),
bucketed AS (
  SELECT s.doc_id,
         CASE WHEN s.mean_logprob >= th.t_hi THEN 'head'
              WHEN s.mean_logprob >= th.t_lo THEN 'middle'
              ELSE 'tail' END AS bucket,
         CASE WHEN s.mean_logprob >= th.t_hi THEN 0
              WHEN s.mean_logprob >= th.t_lo THEN 1
              ELSE 2 END AS phase,
         CAST(('0x' || substr(md5('v1:' || CAST(s.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM scored s CROSS JOIN th
),
sharded AS (SELECT *, CAST(h % 4 AS INT) AS shard FROM bucketed)
SELECT doc_id, bucket, phase, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY phase, shard ORDER BY h, doc_id) AS INT) AS pos
FROM sharded
ORDER BY doc_id
"""


def q_curate_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR target-domain selection (Xie et al. 2023): src0 documents
    are the target domain, the rest is the raw pool; hashed
    unigram+bigram importance weights pick the Gumbel top-20. The
    oracle replays the whole stack — hashed-bucket models, add-one
    smoothing, the md5-seeded Gumbel keys — bit-for-bit."""
    d = load(spark, sf_dir, "documents")
    target = d.where(F.col("source") == "src0").select("doc_id", "text")
    raw = d.where(F.col("source") != "src0").select("doc_id", "text")
    return T.dsir_select(raw, target, "text", "doc_id", k=20).orderBy(
        F.col("key").desc(), "doc_id"
    )


def _oracle_dsir(n_buckets: int = 10_000, seed: str = "dsir1", k: int = 20, temperature: float = 1.0) -> str:
    """Parameterized DuckDB replay of dsir_select — shared by the
    conformance constant below and the differential fuzz."""
    return f"""
WITH raw AS (SELECT doc_id, text FROM documents WHERE source != 'src0'),
tgt AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
rw AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS ws FROM raw),
tw AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS ws FROM tgt),
rfeat AS (
  SELECT doc_id, f FROM (
    SELECT doc_id, UNNEST(ws) AS f FROM rw
    UNION ALL
    SELECT doc_id, ws[t.i] || ' ' || ws[t.i + 1] AS f
    FROM rw, UNNEST(generate_series(1, len(ws) - 1)) t(i)
  ) WHERE f != ''
),
tfeat AS (
  SELECT doc_id, f FROM (
    SELECT doc_id, UNNEST(ws) AS f FROM tw
    UNION ALL
    SELECT doc_id, ws[t.i] || ' ' || ws[t.i + 1] AS f
    FROM tw, UNNEST(generate_series(1, len(ws) - 1)) t(i)
  ) WHERE f != ''
),
rb AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 15))::BIGINT % {n_buckets} AS bucket FROM rfeat),
tb AS (SELECT ('0x' || substr(md5(f), 1, 15))::BIGINT % {n_buckets} AS bucket FROM tfeat),
rc AS (SELECT bucket, COUNT(*) AS c_raw FROM rb GROUP BY bucket),
tc AS (SELECT bucket, COUNT(*) AS c_t FROM tb GROUP BY bucket),
tot AS (
  SELECT (SELECT COUNT(*) FROM rb) AS n_raw, (SELECT COUNT(*) FROM tb) AS n_t
),
model AS (
  SELECT COALESCE(rc.bucket, tc.bucket) AS bucket,
         LOG10(CAST(COALESCE(tc.c_t, 0) + 1 AS DOUBLE) / (tot.n_t + {n_buckets}))
         - LOG10(CAST(COALESCE(rc.c_raw, 0) + 1 AS DOUBLE) / (tot.n_raw + {n_buckets})) AS llr
  FROM rc FULL OUTER JOIN tc ON rc.bucket = tc.bucket CROSS JOIN tot
),
scored AS (
  SELECT rb.doc_id, ROUND(SUM(m.llr), 5) AS log_ratio
  FROM rb JOIN model m USING (bucket) GROUP BY rb.doc_id
),
keyed AS (
  SELECT doc_id, log_ratio,
         ROUND(log_ratio / {temperature} + (-LN(-LN(
           (('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
           / 4294967296.0
         ))), 5) AS key
  FROM scored
)
SELECT doc_id, log_ratio, key FROM keyed
ORDER BY key DESC, doc_id LIMIT {k}
"""


ORACLE_CURATE_DSIR = _oracle_dsir()


def q_text_clip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination APPLIED (PaLM-style): tokens covered
    by any benchmark-overlapping 3-gram are removed, the rest of the
    document survives — the action half of text_contamination_spans.
    src0 is the benchmark; only contaminated docs are returned (the
    pass-through majority would dominate the hash with unchanged
    text)."""
    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("source") == "src0").select("doc_id", "text")
    corpus = d.where(F.col("source") != "src0").select("doc_id", "text")
    return (
        D.clip_contaminated_spans(corpus, bench, "text", "doc_id", n=3)
        .where(F.col("n_removed") > 0)
        .orderBy("doc_id")
    )


ORACLE_TEXT_CLIP_SPANS = """
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, source, t.i AS pos, array_to_string(ws[t.i + 1 : t.i + 3], ' ') AS gram
  FROM w, UNNEST(generate_series(0, len(ws) - 3)) t(i)
  WHERE len(ws) >= 3
),
h AS (
  SELECT doc_id, source, pos,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gram_hash
  FROM g
),
bench AS (SELECT DISTINCT gram_hash FROM h WHERE source = 'src0'),
starts AS (
  SELECT DISTINCT h.doc_id, h.pos FROM h JOIN bench USING (gram_hash)
  WHERE h.source != 'src0'
),
toks AS (
  SELECT w.doc_id, t.i AS idx, ws[t.i + 1] AS word, len(ws) AS n_words
  FROM w, UNNEST(generate_series(0, len(ws) - 1)) t(i)
  WHERE w.source != 'src0'
),
flagged AS (
  SELECT tk.doc_id, tk.idx, tk.word, tk.n_words,
         EXISTS (
           SELECT 1 FROM starts s
           WHERE s.doc_id = tk.doc_id AND tk.idx >= s.pos AND tk.idx < s.pos + 3
         ) AS cov
  FROM toks tk
),
rebuilt AS (
  -- aggregate over ALL tokens so a fully-clipped doc still yields a
  -- row (empty clean_text), matching the Spark side
  SELECT doc_id,
         COALESCE(STRING_AGG(word, ' ' ORDER BY idx) FILTER (WHERE NOT cov), '') AS clean_text,
         MAX(n_words) AS n_all,
         COUNT(*) FILTER (WHERE NOT cov) AS n_kept
  FROM flagged GROUP BY doc_id
),
contam AS (SELECT DISTINCT doc_id FROM starts)
SELECT r.doc_id, r.clean_text,
       CAST(r.n_all AS INT) AS n_words,
       CAST(r.n_all - r.n_kept AS INT) AS n_removed
FROM rebuilt r JOIN contam USING (doc_id)
ORDER BY r.doc_id
"""


def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher quality rule set (Rae et al. 2021 §A1.1)
    as per-rule booleans over the documents table; the oracle replays
    every rule — word/line array arithmetic, symbol ratios, the
    stopword intersection — exactly. The synthetic fixture's vocabulary
    carries few English stopwords, so the conformance point lowers
    (min_words, min_stopwords) to (40, 1) to make the gate columns
    discriminating here; the operator's defaults stay the paper's."""
    d = load(spark, sf_dir, "documents")
    return T.gopher_rules(
        d.select("doc_id", "text"), "text", "doc_id", min_words=40, min_stopwords=1
    ).orderBy("doc_id")


def _oracle_gopher(
    min_words: int = 40,
    max_words: int = 100_000,
    min_mwl: float = 3.0,
    max_mwl: float = 10.0,
    max_symbol: float = 0.1,
    max_bullet: float = 0.9,
    max_ellipsis: float = 0.3,
    min_alpha: float = 0.8,
    min_stop: int = 1,
) -> str:
    """Parameterized DuckDB replay of gopher_rules — shared by the
    conformance constant below and the differential fuzz. Note the
    literal braces in the regex-free SQL are safe under f-string
    interpolation (none present)."""
    return f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w != '') AS ws,
         string_split(text, chr(10)) AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         GREATEST(len(ws), 1) AS nw1,
         -- COALESCE: list_sum([]) is NULL in DuckDB but the operator's
         -- F.aggregate seed makes an empty doc 0.0 (r9 pathological
         -- fuzz found the divergence on empty/whitespace-only docs)
         (CAST((CASE WHEN (COALESCE(list_sum(list_transform(ws, w -> length(w))), 0)) < 0 THEN -(((((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) // (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100 + ((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) // (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) // (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) // (CAST(GREATEST(len(ws), 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) >= (CAST(GREATEST(len(ws), 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) // (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100 + ((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) // (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) // (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) // (CAST(GREATEST(len(ws), 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) * 100) % (CAST(GREATEST(len(ws), 1) AS BIGINT))) >= (CAST(GREATEST(len(ws), 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS mean_word_len,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         CAST( (length(text) - length(replace(text, '…', '')))
             + (length(text) - length(replace(text, '...', ''))) / 3.0 AS INT) AS n_ellipsis,
         GREATEST(len(lines), 1) AS n_lines,
         len(list_filter(lines, l ->
              starts_with(l, '•') OR starts_with(l, '‣') OR starts_with(l, '▪')
              OR starts_with(l, '- ') OR starts_with(l, '* '))) AS bullet_starts,
         len(list_filter(lines, l -> ends_with(l, '...') OR ends_with(l, '…'))) AS ellipsis_ends,
         len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
         len(list_intersect(list_distinct(ws),
             ['the','be','to','of','and','that','have','with'])) AS n_stopwords
  FROM base
),
flags AS (
  SELECT doc_id, n_words, mean_word_len, n_stopwords,
         (n_words >= {min_words} AND n_words <= {max_words}) AS word_count_ok,
         (mean_word_len >= {min_mwl} AND mean_word_len <= {max_mwl}) AS mean_word_len_ok,
         (CAST(n_hash AS DOUBLE) / nw1 <= {max_symbol} AND CAST(n_ellipsis AS DOUBLE) / nw1 <= {max_symbol})
           AS symbol_ratio_ok,
         (CAST(bullet_starts AS DOUBLE) / n_lines < {max_bullet}) AS bullet_lines_ok,
         (CAST(ellipsis_ends AS DOUBLE) / n_lines <= {max_ellipsis}) AS ellipsis_lines_ok,
         (CAST(alpha_words AS DOUBLE) / nw1 >= {min_alpha}) AS alpha_words_ok,
         (n_stopwords >= {min_stop}) AS stopwords_ok
  FROM m
)
SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
       CAST(n_stopwords AS INT) AS n_stopwords,
       word_count_ok, mean_word_len_ok, symbol_ratio_ok, bullet_lines_ok,
       ellipsis_lines_ok, alpha_words_ok, stopwords_ok,
       (word_count_ok AND mean_word_len_ok AND symbol_ratio_ok AND bullet_lines_ok
        AND ellipsis_lines_ok AND alpha_words_ok AND stopwords_ok) AS pass_gopher
FROM flags ORDER BY doc_id
"""


ORACLE_TEXT_GOPHER_RULES = _oracle_gopher()


def q_text_sentence_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's three-sentence-span dedup: each doc is 5 sentences — a
    unique opener, a per-source boilerplate TRIO (the duplicated
    3-sentence span, shared by every doc of the source), a unique
    closer — plus an unterminated tail fragment. keep='first' keeps
    the globally-first copy of the trio and strips it everywhere else;
    the oracle replays sentence extraction, span windows, the
    global-first choice, index unioning, and the rebuild."""
    d = load(spark, sf_dir, "documents")
    built = d.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 30),
            F.lit(". footer one for "),
            F.col("source"),
            F.lit(". footer two for "),
            F.col("source"),
            F.lit(". footer three for "),
            F.col("source"),
            F.lit(". "),
            F.substring("text", 31, 25),
            F.lit("? trailing bit"),
        ).alias("text"),
    )
    return T.sentence_span_dedup(built, "text", "doc_id", span=3, keep="first").orderBy(
        "doc_id"
    )


def _span_dedup_sql(src: str, span: int = 3) -> str:
    """DuckDB replay of :func:`easydb_server_spark.operators.text.
    sentence_span_dedup` (keep='first') over a relation ``src`` with
    (doc_id, t) — shared by the standalone entry and the composed C4
    pipeline so the two oracles cannot drift."""
    return f"""base AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(t, '[^.!?]*[.!?]'), s -> trim(s)) AS ss,
         trim(regexp_replace(t, '.*[.!?]', '', 'g')) AS tail
  FROM {src}
),
sp AS (
  SELECT doc_id, g.i AS pos,
         array_to_string(ss[g.i + 1 : g.i + {span}], ' ') AS sp
  FROM base, UNNEST(generate_series(0, len(ss) - {span})) g(i)
  WHERE len(ss) >= {span}
),
freq AS (SELECT sp FROM sp GROUP BY sp HAVING COUNT(*) >= 2),
dup AS (
  SELECT s.doc_id, s.pos,
         ROW_NUMBER() OVER (PARTITION BY s.sp ORDER BY s.doc_id, s.pos) AS r
  FROM sp s JOIN freq USING (sp)
),
drops AS (
  SELECT DISTINCT d.doc_id, u.j AS i
  FROM dup d, UNNEST(generate_series(d.pos, d.pos + {span - 1})) u(j)
  WHERE d.r > 1
),
sent AS (
  SELECT doc_id, g.i - 1 AS idx, ss[g.i] AS s
  FROM base, UNNEST(generate_series(1, len(ss))) g(i)
),
keptagg AS (
  SELECT s.doc_id, STRING_AGG(s.s, ' ' ORDER BY s.idx) AS rebuilt
  FROM sent s ANTI JOIN drops d ON d.doc_id = s.doc_id AND d.i = s.idx
  GROUP BY s.doc_id
),
ndrop AS (SELECT doc_id, COUNT(*) AS n_removed FROM drops GROUP BY doc_id)
SELECT b.doc_id,
       CASE WHEN b.tail <> '' AND COALESCE(k.rebuilt, '') <> ''
              THEN k.rebuilt || ' ' || b.tail
            WHEN b.tail <> '' THEN b.tail
            ELSE COALESCE(k.rebuilt, '') END AS clean_text,
       CAST(len(b.ss) AS INT) AS n_sents,
       CAST(COALESCE(n.n_removed, 0) AS INT) AS n_removed
FROM base b
LEFT JOIN keptagg k USING (doc_id)
LEFT JOIN ndrop n USING (doc_id)
ORDER BY b.doc_id"""


ORACLE_TEXT_SENTENCE_SPAN_DEDUP = (
    """
WITH built AS (
  SELECT doc_id,
         substr(text, 1, 30) || '. footer one for ' || source
         || '. footer two for ' || source
         || '. footer three for ' || source
         || '. ' || substr(text, 31, 25) || '? trailing bit' AS t
  FROM documents
),
"""
    + _span_dedup_sql("built")
)


def q_emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed sample covariance of the embedding corpus — the
    whitening/PCA preprocessing statistic, two-pass fixed-point:
    exact INT64 means first (floor(x·1e7) sums), then centered
    products quantized per-row to floor((xi−μi)(xj−μj)·1e6) INT64
    before ANY summation, so the result is bit-identical under any
    partitioning. The final 5-decimal rounding is ALSO integer-exact
    (functions/exactround: half-away-from-zero on the BIGINT rational,
    never ROUND(double) — whose midpoint tie-break differs between
    Spark and DuckDB by design). The oracle replays the identical
    quantized arithmetic AND the identical integer rounding over the
    same vectors, so the two engines agree on every run, not most
    runs."""
    e = load(spark, sf_dir, "embeddings")
    return S.emb_covariance(e, "embedding").orderBy("i", "j")


ORACLE_EMB_COVARIANCE = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
x AS (
  SELECT vec_id, u.i - 1 AS i, e[u.i] AS xi
  FROM v, UNNEST(generate_series(1, len(e))) u(i)
),
n AS (SELECT COUNT(*) AS n FROM v),
mu AS (
  SELECT i,
         CAST(SUM(CAST(floor(xi * 10000000.0) AS BIGINT)) AS DOUBLE)
           / (MAX(n.n) * 10000000.0) AS m
  FROM x, n GROUP BY i
),
c AS (
  SELECT x.vec_id, x.i, x.xi - mu.m AS ci
  FROM x JOIN mu USING (i)
),
q AS (
  SELECT a.i AS i, b.i AS j,
         SUM(CAST(floor(a.ci * b.ci * 1000000.0) AS BIGINT)) AS qsum
  FROM c a JOIN c b USING (vec_id)
  GROUP BY a.i, b.i
)
SELECT CAST(q.i AS INT) AS i, CAST(q.j AS INT) AS j,
       {cov_round} AS cov
FROM q CROSS JOIN n
ORDER BY i, j
""".format(cov_round=round_div_sql("q.qsum", "(n.n - 1) * 1000000", 5, "duckdb"))


def q_text_match_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aho-Corasick substring matching against a pattern TABLE: per
    doc, the count of every (position, pattern) occurrence — overlaps
    included, which the injected 'babab' makes observable ('ba' twice,
    'bab' twice, 'abab' once) — plus the any_match gate. The oracle
    re-counts by brute-force position enumeration, so the automaton's
    exact multi-pattern semantics are pinned."""
    d = load(spark, sf_dir, "documents")
    inject = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" babab CASINO night"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" spam spam lists"))
        .otherwise(F.lit(""))
    )
    built = d.select("doc_id", F.concat(F.col("text"), inject).alias("text"))
    # r17: Arrow-created fixture table (see text_url_blocklist)
    import pandas as pd

    pats = spark.createDataFrame(
        pd.DataFrame({"pat": ["casino", "spam", "ba", "bab", "abab", "oin"]}),
        "pat string",
    )
    return T.match_any_substrings(built, "text", "doc_id", pats).orderBy("doc_id")


ORACLE_TEXT_MATCH_ANY = """
WITH built AS (
  SELECT doc_id,
         lower(text || CASE WHEN doc_id % 4 = 0 THEN ' babab CASINO night'
                            WHEN doc_id % 4 = 1 THEN ' spam spam lists'
                            ELSE '' END) AS t
  FROM documents
),
pats AS (SELECT * FROM (VALUES ('casino'), ('spam'), ('ba'), ('bab'), ('abab'), ('oin')) p(pat)),
hits AS (
  SELECT b.doc_id, COUNT(*) AS cnt
  FROM built b
  JOIN pats p ON contains(b.t, p.pat),
       UNNEST(generate_series(1, len(b.t) - length(p.pat) + 1)) g(i)
  WHERE substr(b.t, g.i, length(p.pat)) = p.pat
  GROUP BY b.doc_id
)
SELECT b.doc_id,
       CAST(COALESCE(h.cnt, 0) AS INT) AS n_matches,
       (COALESCE(h.cnt, 0) > 0) AS any_match
FROM built b LEFT JOIN hits h USING (doc_id)
ORDER BY b.doc_id
"""


def q_c4_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE C4 pipeline composed in ONE plan: the rule gate
    (line filter + page flags, same construction as text_c4_rules) →
    admitted docs' line-filtered text → three-sentence-span dedup
    (keep='first'). The two stage oracles are individually
    driver-verified (text_c4_rules, text_sentence_span_dedup); this
    entry locks their COMPOSITION, the full published C4 recipe.
    Filtered text is materialized once at the stage boundary —
    the same persist lesson as crawl_pipeline (without it Catalyst
    re-runs the line-filter regex chain per span-dedup consumer)."""
    d = load(spark, sf_dir, "documents")
    line4 = F.when(
        F.col("doc_id") % 3 == 0,
        F.lit("this line mentions javascript libraries today."),
    ).otherwise(F.lit("a perfectly ordinary sentence with several words."))
    line5 = F.when(
        F.col("doc_id") % 11 == 0,
        F.lit("lorem ipsum dolor sit amet for padding."),
    ).otherwise(F.lit("another good sentence appears right here!"))
    line6 = F.when(
        F.col("doc_id") % 13 == 0, F.lit("code snippet { return 1; }")
    ).otherwise(F.lit("closing thought ends with a question mark?"))
    line7 = F.when(
        F.col("doc_id") % 17 == 0,
        F.lit("this page contains badness somewhere inside."),
    ).otherwise(F.lit("a safe concluding sentence stands here."))
    built = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.col("text"), F.lit(".")),
            F.substring("text", 1, 20),
            F.lit("too short."),
            line4,
            line5,
            line6,
            line7,
        ).alias("text"),
    )
    admitted = (
        T.c4_rules(built, "text", "doc_id", naughty_words=("badness",))
        .where(F.col("pass_c4"))
        .select("doc_id", "clean_text")
        .localCheckpoint(eager=True)
    )
    return T.sentence_span_dedup(
        admitted, "clean_text", "doc_id", span=3, keep="first"
    ).orderBy("doc_id")


ORACLE_C4_PIPELINE = (
    """
WITH c4built AS (
  SELECT doc_id,
         text || '.'
         || chr(10) || substr(text, 1, 20)
         || chr(10) || 'too short.'
         || chr(10) || CASE WHEN doc_id % 3 = 0
              THEN 'this line mentions javascript libraries today.'
              ELSE 'a perfectly ordinary sentence with several words.' END
         || chr(10) || CASE WHEN doc_id % 11 = 0
              THEN 'lorem ipsum dolor sit amet for padding.'
              ELSE 'another good sentence appears right here!' END
         || chr(10) || CASE WHEN doc_id % 13 = 0
              THEN 'code snippet { return 1; }'
              ELSE 'closing thought ends with a question mark?' END
         || chr(10) || CASE WHEN doc_id % 17 = 0
              THEN 'this page contains badness somewhere inside.'
              ELSE 'a safe concluding sentence stands here.' END AS text
  FROM documents
),
cf AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
           x -> regexp_matches(trim(x), '[.!?"]$')
                AND len(list_filter(string_split(trim(x), ' '), w -> w != '')) >= 5
                AND NOT contains(lower(trim(x)), 'javascript')) AS kl
  FROM c4built
),
admitted AS (
  SELECT doc_id, COALESCE(array_to_string(kl, chr(10)), '') AS t
  FROM cf
  WHERE len(regexp_extract_all(COALESCE(array_to_string(kl, chr(10)), ''), '[.!?]')) >= 3
    AND NOT contains(lower(text), 'lorem ipsum')
    AND NOT contains(lower(text), '{')
    AND NOT contains(lower(text), 'badness')
),
"""
    + _span_dedup_sql("admitted")
)


def q_text_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NB log-odds quality classifier end-to-end: train on the first
    half of the corpus (src0 docs as the high-quality reference class,
    the rest as the crawl class), persist the model, score ALL docs
    against the frozen artifact. The oracle re-derives training
    (vocab top-k with the same tie order), smoothing, and scoring in
    closed form."""
    d = load(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") < 250)
    T.write_nb_quality(
        train.where(F.col("source") == "src0"),
        train.where(F.col("source") != "src0"),
        "text",
        "nb_quality_conf",
        vocab_size=2000,
    )
    return T.score_nb_quality(d, "text", "doc_id", spark, "nb_quality_conf").orderBy(
        "doc_id"
    )


ORACLE_TEXT_NB_QUALITY = """
WITH tok AS (
  SELECT doc_id, source, u.term
  FROM documents,
       UNNEST(list_filter(regexp_split_to_array(text, ' +'), x -> x != '')) u(term)
),
counts AS (
  SELECT term,
         SUM(CASE WHEN source = 'src0' AND doc_id < 250 THEN 1 ELSE 0 END) AS c_pos,
         SUM(CASE WHEN source <> 'src0' AND doc_id < 250 THEN 1 ELSE 0 END) AS c_neg
  FROM tok GROUP BY term
),
nz AS (SELECT * FROM counts WHERE c_pos + c_neg > 0),
vocab AS (SELECT * FROM nz ORDER BY (c_pos + c_neg) DESC, term LIMIT 2000),
meta AS (SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg, COUNT(*) AS v FROM vocab),
scored AS (
  SELECT t.doc_id,
         COUNT(*) AS n_terms,
         COUNT(v.term) AS n_scored,
         ROUND(COALESCE(SUM(
             log10((v.c_pos + 1) / (m.n_pos + m.v))
           - log10((v.c_neg + 1) / (m.n_neg + m.v))), 0.0), 5) AS log_odds
  FROM tok t LEFT JOIN vocab v USING (term) CROSS JOIN meta m
  GROUP BY t.doc_id
)
SELECT doc_id,
       CAST(n_terms AS BIGINT) AS n_terms,
       CAST(n_scored AS INT) AS n_scored,
       log_odds,
       (log_odds > 0) AS nb_pass
FROM scored ORDER BY doc_id
"""


def q_text_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. 2020 §2.2) over a
    construction that makes every rule observable: per doc, a long
    terminal-punctuated line (kept), an unpunctuated fragment
    (dropped), a 2-word line (dropped), a javascript mention on
    doc_id%3=0 (dropped there), a lorem-ipsum page flag on %11=0, a
    curly-brace flag on %13=0, and a naughty-word flag on %17=0. The
    oracle replays construction, line filtering, sentence counting,
    and the page flags."""
    d = load(spark, sf_dir, "documents")
    line4 = F.when(
        F.col("doc_id") % 3 == 0,
        F.lit("this line mentions javascript libraries today."),
    ).otherwise(F.lit("a perfectly ordinary sentence with several words."))
    line5 = F.when(
        F.col("doc_id") % 11 == 0,
        F.lit("lorem ipsum dolor sit amet for padding."),
    ).otherwise(F.lit("another good sentence appears right here!"))
    line6 = F.when(
        F.col("doc_id") % 13 == 0, F.lit("code snippet { return 1; }")
    ).otherwise(F.lit("closing thought ends with a question mark?"))
    line7 = F.when(
        F.col("doc_id") % 17 == 0,
        F.lit("this page contains badness somewhere inside."),
    ).otherwise(F.lit("a safe concluding sentence stands here."))
    built = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.col("text"), F.lit(".")),
            F.substring("text", 1, 20),
            F.lit("too short."),
            line4,
            line5,
            line6,
            line7,
        ).alias("text"),
    )
    return T.c4_rules(built, "text", "doc_id", naughty_words=("badness",)).orderBy(
        "doc_id"
    )


ORACLE_TEXT_C4_RULES = """
WITH built AS (
  SELECT doc_id,
         text || '.'
         || chr(10) || substr(text, 1, 20)
         || chr(10) || 'too short.'
         || chr(10) || CASE WHEN doc_id % 3 = 0
              THEN 'this line mentions javascript libraries today.'
              ELSE 'a perfectly ordinary sentence with several words.' END
         || chr(10) || CASE WHEN doc_id % 11 = 0
              THEN 'lorem ipsum dolor sit amet for padding.'
              ELSE 'another good sentence appears right here!' END
         || chr(10) || CASE WHEN doc_id % 13 = 0
              THEN 'code snippet { return 1; }'
              ELSE 'closing thought ends with a question mark?' END
         || chr(10) || CASE WHEN doc_id % 17 = 0
              THEN 'this page contains badness somewhere inside.'
              ELSE 'a safe concluding sentence stands here.' END AS text
  FROM documents
),
f AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS ls,
         list_filter(string_split(text, chr(10)),
           x -> regexp_matches(trim(x), '[.!?"]$')
                AND len(list_filter(string_split(trim(x), ' '), w -> w != '')) >= 5
                AND NOT contains(lower(trim(x)), 'javascript')) AS kl
  FROM built
),
g AS (
  SELECT doc_id,
         COALESCE(array_to_string(kl, chr(10)), '') AS clean_text,
         len(ls) AS n_lines, len(kl) AS n_kept_lines,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(lower(text), '{') AS has_brace,
         contains(lower(text), 'badness') AS has_naughty
  FROM f
)
SELECT doc_id, clean_text,
       CAST(n_lines AS INT) AS n_lines,
       CAST(n_kept_lines AS INT) AS n_kept_lines,
       CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS INT) AS n_sentences,
       has_lorem, has_brace, has_naughty,
       (len(regexp_extract_all(clean_text, '[.!?]')) >= 3
        AND NOT has_lorem AND NOT has_brace AND NOT has_naughty) AS pass_c4
FROM g ORDER BY doc_id
"""


def q_dedup_keepers_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-priority cluster resolution: the same near-dup pipeline
    as dedup_pipeline_keepers (exact Jaccard @0.6 → connected
    components) but the keeper is each cluster's HIGHEST-QUALITY
    member (composite quality score, ties → min doc_id) — the rule
    production curation actually uses. Returns survivors with their
    component and quality; the oracle replays closure + ranking."""
    from easydb_server_spark.operators.clusters import (
        connected_components,
        keepers_by_priority,
    )
    d = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        d, "text", "doc_id", threshold=0.6, max_doc_freq=NGRAM_MAX_DF
    )
    cc = connected_components(pairs)
    pr = T.with_quality(d.select("doc_id", "text"), "text", "priority").select(
        "doc_id", "priority"
    )
    keep = keepers_by_priority(cc, pr)
    drops = (
        cc.join(keep.select("component", "keeper"), "component")
        .where(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
    )
    return (
        d.join(drops, "doc_id", "left_anti")
        .join(cc, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("component"))
        .join(pr, "doc_id")
        .select("doc_id", "component", F.col("priority").alias("quality"))
        .orderBy("doc_id")
    )


ORACLE_DEDUP_KEEPERS_QUALITY = f"""
WITH RECURSIVE {_SHINGLES_CTE},
{_NGRAM_INTER_CTES},
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE (CAST((CASE WHEN (n_inter) < 0 THEN -(((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_inter AS BIGINT)) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100 + ((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) // (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_inter AS BIGINT)) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) * 100) % (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT))) >= (CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) >= 0.6
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
),
qt AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS INT) AS n_punct
  FROM documents
),
q AS (
  SELECT doc_id, (CAST((CASE WHEN (qnum) < 0 THEN -(((((abs(CAST(qnum AS BIGINT)) // (CAST(qden AS BIGINT))) * 100 + ((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) >= (CAST(qden AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(qnum AS BIGINT)) // (CAST(qden AS BIGINT))) * 100 + ((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) * 100 + ((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) // (CAST(qden AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(qnum AS BIGINT)) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) * 100) % (CAST(qden AS BIGINT))) >= (CAST(qden AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS quality
  FROM (SELECT doc_id,
               CAST(n_words AS BIGINT) * GREATEST(n_words, 1) * GREATEST(n_chars, 1)
                 + 800 * CAST(len(list_filter(ws, w -> list_contains([{", ".join(repr(w) for w in T.LANG_PROFILES["en"])}], w))) AS BIGINT) * GREATEST(n_chars, 1)
                 - 2000 * CAST(n_punct AS BIGINT) * GREATEST(n_words, 1) AS qnum,
               400 * CAST(GREATEST(n_words, 1) AS BIGINT) * GREATEST(n_chars, 1) AS qden
        FROM qt)
),
keepers AS (
  SELECT component, doc_id AS keeper FROM (
    SELECT l.component, l.doc_id,
           ROW_NUMBER() OVER (PARTITION BY l.component
                              ORDER BY q.quality DESC, l.doc_id ASC) AS r
    FROM labels l JOIN q USING (doc_id)
  ) WHERE r = 1
),
drops AS (
  SELECT l.doc_id FROM labels l JOIN keepers k ON l.component = k.component
  WHERE l.doc_id != k.keeper
)
SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS component, q.quality
FROM documents d
LEFT JOIN labels l ON l.doc_id = d.doc_id
JOIN q ON q.doc_id = d.doc_id
WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
ORDER BY d.doc_id
"""


def q_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document duplicate-line removal (MassiveText curation).
    The fixture documents are single-line, so the conformance point
    BUILDS multi-line docs deterministically — each doc becomes
    (text, first-40-chars, text) joined by newlines, guaranteeing a
    duplicate third line — and both engines replay the construction."""
    d = load(spark, sf_dir, "documents")
    built = d.select(
        "doc_id",
        F.concat_ws(
            "\n", F.col("text"), F.substring("text", 1, 40), F.col("text")
        ).alias("text"),
    )
    return T.line_dedup(built, "text", "doc_id").orderBy("doc_id")


ORACLE_TEXT_LINE_DEDUP = """
WITH built AS (
  SELECT doc_id,
         text || chr(10) || substr(text, 1, 40) || chr(10) || text AS t
  FROM documents
),
l AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM built),
kept AS (
  SELECT doc_id, ls, list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kl
  FROM l
)
SELECT doc_id,
       array_to_string(kl, chr(10)) AS clean_text,
       CAST(len(ls) AS INT) AS n_lines,
       CAST(len(ls) - len(kl) AS INT) AS n_removed
FROM kept ORDER BY doc_id
"""


def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 3-gram novelty of the non-src0 corpus against the src0
    reference — the memorization/contribution dual of contamination;
    the oracle replays the distinct-gram sets and the anti-join."""
    d = load(spark, sf_dir, "documents")
    ref = d.where(F.col("source") == "src0").select("doc_id", "text")
    corpus = d.where(F.col("source") != "src0").select("doc_id", "text")
    return T.ngram_novelty(corpus, ref, "text", "doc_id", n=3).orderBy("doc_id")


ORACLE_TEXT_NGRAM_NOVELTY = """
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(ws[t.i + 1 : t.i + 3], ' ') AS gram
  FROM w, UNNEST(generate_series(0, len(ws) - 3)) t(i)
  WHERE len(ws) >= 3
),
h AS (
  SELECT doc_id, source, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h FROM g
),
ref AS (SELECT DISTINCT h FROM h WHERE source = 'src0'),
cg AS (SELECT doc_id, h FROM h WHERE source != 'src0'),
tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM cg GROUP BY doc_id),
nov AS (
  SELECT cg.doc_id, COUNT(*) AS n_novel
  FROM cg ANTI JOIN ref USING (h) GROUP BY cg.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(v.n_novel, 0) AS BIGINT) AS n_novel,
       (CAST((CASE WHEN (COALESCE(v.n_novel, 0)) < 0 THEN -(((((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) // (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100 + ((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) // (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) // (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) // (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) >= (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) // (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100 + ((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) // (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) // (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) // (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(v.n_novel, 0) AS BIGINT)) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) * 100) % (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT))) >= (CAST(GREATEST(COALESCE(t.n_grams, 0), 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS novelty_frac
FROM (SELECT doc_id FROM documents WHERE source != 'src0') d
LEFT JOIN tot t ON t.doc_id = d.doc_id
LEFT JOIN nov v ON v.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ---------- unigram-LM tokenizer (round 10) ----------

# Frozen unigram vocabulary: the (piece -> scaled ln-prob) table that
# a `unigram_train(vocab_size=64, iterations=2, seed_size=2000)` run
# over the sf0.01 documents corpus produced, frozen as a literal so
# the DuckDB oracle can replay Viterbi segmentation bit-for-bit — the
# same freeze pattern as the NB classifier coefficients. Scores are
# round(ln(count/total) * 1e6) BIGINTs (operators/unigram.py SCALE).
UNIGRAM_VOCAB: dict[str, int] = {
    "e": -2706482, "join": -3744880, "hash": -3762672, "row": -3766905,
    "batc": -3773288, "h": -3773288, "scan": -3774356, "colu": -3776495,
    "cust": -3776495, "mn": -3776495, "omer": -3776495, "er": -3777566,
    "filt": -3777566, "l": -3782940, "smal": -3782940, "merg": -3793774,
    "slow": -3793774, "or": -3800332, "orde": -3800332, "r": -3800332,
    "vect": -3800332, "line": -3802527, "data": -3804727, "tabl": -3804727,
    "agg": -3812466, "valu": -3816916, "key": -3818031, "ream": -3827000,
    "st": -3827000, "ow": -3829255, "wind": -3829255, "a": -3836050,
    "park": -3836050, "s": -3836050, "g": -3838325, "part": -3838325,
    "roup": -3838325, "big": -3840605, "sort": -3845182, "quer": -3846330,
    "y": -3846330, "fast": -3866040, "the": -3882570, "dup": -7357875,
}


def q_text_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenization under the frozen
    vocabulary: per-doc word/char/Viterbi-token counts and the exact
    BIGINT path score. Segmentation folds once per DISTINCT word (the
    bpe_apply collapse); the oracle replays the same DP as a DuckDB
    list_reduce with identical integer scores and the identical
    first-max (shortest-piece) tie-break."""
    from easydb_server_spark.operators import unigram as UG

    d = load(spark, sf_dir, "documents")
    return UG.unigram_apply(d, "text", "doc_id", UNIGRAM_VOCAB).orderBy("doc_id")


def _oracle_unigram(vocab: dict[str, int], max_len: int = 4) -> str:
    """DuckDB replay of the Viterbi DP as TWO scalar-array folds per
    distinct word — one over the true scores (best total S), one over
    packed scores s*PACK - 1 (best = PACK*S - n_pieces, because the
    packing makes the maximizer prefer fewer pieces among equal-score
    paths), so n_pieces = PACK*S - packed. No argmax, no path strings:
    DuckDB 1.0's list_reduce mis-evaluates struct accumulators whose
    fields cross-reference (verified by bisection — a path field
    reading the score field sees stale state), so the oracle never
    carries more than the score window. The candidate list is
    textually repeated (list_max per step) because SQL lambdas have no
    let-binding; a few redundant integer adds per position are
    irrelevant at oracle scale."""
    pack = 1 << 20
    sent = "(-100000000000000000)::BIGINT"
    unk, unk_packed = -20_000_000, -20_000_000 * pack - 1
    items = sorted(vocab.items())
    keys = ", ".join("'%s'" % k.replace("'", "''") for k, _ in items)
    vals = ", ".join(f"({v})::BIGINT" for _, v in items)

    def fold(packed: bool) -> str:
        cands = []
        for l in range(1, max_len + 1):
            raw = f"m[substr(word, x.i - {l - 1}, {l})][1]"
            if packed:
                raw = f"{raw} * {pack} - 1"
            fb = (f"({unk_packed})::BIGINT" if packed else f"({unk})::BIGINT") if l == 1 else sent
            c = f"acc.w[{l}] + coalesce({raw}, {fb})"
            if l > 1:
                c = f"CASE WHEN x.i >= {l} THEN {c} ELSE {sent} END"
            cands.append(c)
        cl = "[" + ", ".join(cands) + "]"
        return f"""list_reduce(
      list_transform(range(0, length(word) + 1), i -> {{i: i,
        w: CASE WHEN i = 0 THEN [0::BIGINT, {sent}, {sent}, {sent}] END}}),
      (acc, x) -> {{i: x.i,
        w: list_prepend(list_max({cl}), acc.w[1:{max_len - 1}])}}).w[1]"""

    return f"""
WITH v AS (SELECT map([{keys}], [{vals}]) AS m),
d AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
              '[^ -~]', '', 'g'), ' +', ' ', 'g')) AS t
  FROM documents
),
w AS (
  SELECT doc_id, substr(word, 1, 24) AS word
  FROM (SELECT doc_id, UNNEST(string_split(t, ' ')) AS word FROM d)
  WHERE word != ''
),
dw AS (SELECT DISTINCT word FROM w),
enc AS (
  SELECT word, s AS score, {pack} * s - packed AS n_pieces
  FROM (SELECT word, {fold(False)} AS s, {fold(True)} AS packed FROM dw, v)
)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(w.word)) AS BIGINT) AS n_chars,
       CAST(SUM(e.n_pieces) AS BIGINT) AS n_tokens,
       CAST(SUM(e.score) AS BIGINT) AS score
FROM w JOIN enc e USING (word)
GROUP BY w.doc_id
ORDER BY w.doc_id
"""


ORACLE_TEXT_UNIGRAM_TOKENIZE = _oracle_unigram(UNIGRAM_VOCAB)


# ---------- G.711 companding + exact signal analysis (round 10) ----------


def _audio_clips(spark: SparkSession, sf_dir: str, base: int, mod: int):
    """Deterministic mono 8 kHz clips from the shared sawtooth recipe
    ``s(doc,i) = ((doc_id*7919 + i*104729) mod 65536) - 32768`` with
    ``n = base + doc_id % mod`` frames — the corpus every audio
    conformance entry builds so its oracle can replay samples in
    closed form without ever seeing bytes."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import encode_wav

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = base + did % mod
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)
                out.append((did, encode_wav(s, 8000)))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    return d.mapInPandas(build, "item_id bigint, payload binary")


def q_multimodal_audio_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 mu-law normalization end-to-end: deterministic clips
    (80 + doc_id % 40 frames) are companded and expanded through the
    real codec (operators/g711.py) and re-featurized. The oracle
    replays the mu-law STAIRCASE in closed-form integer arithmetic —
    segment search, mantissa truncation, bias removal — so a hash
    match proves the compress->expand pair is the ITU quantizer, not
    merely self-consistent."""
    from easydb_server_spark.operators.multimodal import audio_features, transcode_g711

    blobs = _audio_clips(spark, sf_dir, 80, 40)
    staired = transcode_g711(blobs, "payload", "item_id", "mulaw")
    return (
        audio_features(staired, "payload", "item_id")
        .select("item_id", "sample_rate", "n_samples", "rms", "clipping_frac", "peak")
        .orderBy("item_id")
    )


ORACLE_MULTIMODAL_AUDIO_G711 = """
WITH nn AS (SELECT doc_id, 80 + doc_id % 40 AS n FROM documents),
raw AS (
  SELECT nn.doc_id, nn.n,
         ((nn.doc_id * 7919 + t.i * 104729) % 65536) - 32768 AS s
  FROM nn, UNNEST(generate_series(0, nn.n - 1)) t(i)
),
stair AS (
  SELECT doc_id, n, s,
         LEAST(ABS(s), 32635) + 132 AS mag
  FROM raw
),
seg AS (
  SELECT doc_id, n, s, mag,
         CASE WHEN mag < 256 THEN 0 WHEN mag < 512 THEN 1
              WHEN mag < 1024 THEN 2 WHEN mag < 2048 THEN 3
              WHEN mag < 4096 THEN 4 WHEN mag < 8192 THEN 5
              WHEN mag < 16384 THEN 6 ELSE 7 END AS e
  FROM stair
),
r AS (
  SELECT doc_id, n,
         CASE WHEN s < 0 THEN -(((((mag >> (e + 3)) & 15) * 8 + 132) << e) - 132)
              ELSE ((((mag >> (e + 3)) & 15) * 8 + 132) << e) - 132 END AS v
  FROM seg
)
SELECT doc_id                                              AS item_id,
       CAST(8000 AS INT)                                   AS sample_rate,
       CAST(MAX(n) AS INT)                                 AS n_samples,
       ROUND(SQRT(CAST(SUM(v * v) AS DOUBLE) / MAX(n)), 4) AS rms,
       CAST(SUM(CASE WHEN ABS(v) >= 32767 THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(n)                                      AS clipping_frac,
       CAST(MAX(ABS(v)) AS INT)                            AS peak
FROM r GROUP BY doc_id ORDER BY doc_id
"""


def q_multimodal_audio_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer signal analysis (zero crossings, energy, dominant
    autocorrelation lag in 1..8 with smallest-lag tie-break) over the
    deterministic clips (60 + doc_id % 30 frames). Every reported
    value is an int64 sum over int64 samples, so the DuckDB oracle —
    a LAG window for crossings and a self-join per lag for the
    autocorrelation argmax — agrees bit-for-bit."""
    from easydb_server_spark.operators.multimodal import audio_analysis

    blobs = _audio_clips(spark, sf_dir, 60, 30)
    return audio_analysis(blobs, "payload", "item_id", max_lag=8).orderBy("item_id")


ORACLE_MULTIMODAL_AUDIO_ANALYSIS = """
WITH nn AS (SELECT doc_id, 60 + doc_id % 30 AS n FROM documents),
s AS (
  SELECT nn.doc_id, nn.n, t.i,
         ((nn.doc_id * 7919 + t.i * 104729) % 65536) - 32768 AS s
  FROM nn, UNNEST(generate_series(0, nn.n - 1)) t(i)
),
zc AS (
  SELECT doc_id, MAX(n) AS n, CAST(SUM(s * s) AS BIGINT) AS energy,
         CAST(SUM(CASE WHEN prev IS NOT NULL
                        AND (s >= 0) != (prev >= 0) THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_crossings
  FROM (SELECT doc_id, n, i, s,
               LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM s)
  GROUP BY doc_id
),
ac AS (
  SELECT a.doc_id, l.lag, CAST(SUM(a.s * b.s) AS BIGINT) AS ac
  FROM UNNEST(generate_series(1, 8)) l(lag)
  JOIN s a ON TRUE
  JOIN s b ON b.doc_id = a.doc_id AND b.i = a.i + l.lag
  GROUP BY a.doc_id, l.lag
),
best AS (
  SELECT doc_id, lag, ac FROM (
    SELECT doc_id, lag, ac,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ac DESC, lag) AS r
    FROM ac
  ) WHERE r = 1
)
SELECT z.doc_id            AS item_id,
       CAST(z.n AS INT)    AS n_samples,
       z.zero_crossings,
       z.energy,
       CAST(b.lag AS INT)  AS dominant_lag,
       b.ac                AS ac_peak
FROM zc z JOIN best b USING (doc_id)
ORDER BY z.doc_id
"""


# ---------- link-graph centrality (round 10) ----------


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (operators/graph.py) over the real
    customer->supplier purchase graph (orders x lineitem, node ids
    2*custkey / 2*suppkey+1): the link-centrality signal crawl
    pipelines rank hosts with, here exercised on the repo's actual
    relational data. Three power iterations; every update is integer
    multiply/floor-divide, so the DuckDB oracle unrolls the identical
    arithmetic as CTEs and the top-100 matches bit-for-bit."""
    from easydb_server_spark.operators.graph import pagerank

    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    edges = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    pr = pagerank(edges, "src", "dst", iterations=3)
    return (
        pr.select(
            "node",
            "rank",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
        )
        .orderBy(F.col("rank").desc(), "node")
        .limit(100)
    )


def _oracle_pagerank(iterations: int = 3) -> str:
    scale = 10**12
    its = []
    for k in range(iterations):
        its.append(
            f"""c{k} AS (
  SELECT e.dst, SUM(r.rank // d.out) AS contrib
  FROM r{k} r JOIN deg d ON d.src = r.node JOIN e ON e.src = r.node
  GROUP BY e.dst
),
g{k} AS (
  SELECT COALESCE(SUM(r.rank), 0) AS dang
  FROM r{k} r LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL
),
r{k + 1} AS (
  SELECT nodes.node,
         (CAST({3 * scale} AS BIGINT) // (20 * n))
           + (17 * (COALESCE(c.contrib, 0) + dang // n) // 20) AS rank
  FROM nodes LEFT JOIN c{k} c ON c.dst = nodes.node, g{k}, nn
)"""
        )
    return (
        f"""WITH e AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS out FROM e GROUP BY src),
r0 AS (SELECT node, CAST({scale} AS BIGINT) // n AS rank FROM nodes, nn),
"""
        + ",\n".join(its)
        + f"""
SELECT node, CAST(rank AS BIGINT) AS rank,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind
FROM r{iterations}
ORDER BY rank DESC, node
LIMIT 100
"""
    )


ORACLE_GRAPH_PAGERANK = _oracle_pagerank(3)


def q_graph_pagerank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_pagerank with the driver-replay dispatch DISABLED
    (driver_max_edges=0): identical fixture, identical arithmetic,
    identical oracle — this entry exists so the driver's correctness
    gate exercises the DISTRIBUTED superstep path every round (the
    replay path is what graph_pagerank takes at these edge counts; the
    r16 verdict's ask #2). Differential tests already force both sides
    equal; this makes the oracle see the scale path too."""
    from easydb_server_spark.operators.graph import pagerank

    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    edges = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    pr = pagerank(edges, "src", "dst", iterations=3, driver_max_edges=0)
    return (
        pr.select(
            "node",
            "rank",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
        )
        .orderBy(F.col("rank").desc(), "node")
        .limit(100)
    )


def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-user sketches per event type
    (operators/sketch.py) — the persistable incremental form of
    approx_distinct. Estimates are implementation-defined
    (DataSketches HLL), so this is a rows-only conformance entry; the
    accuracy bound, determinism, and append-mergeability are
    pytest-locked (tests/test_sketch.py), the same
    principled-substitute pattern as agg_approx_distinct."""
    from easydb_server_spark.operators.sketch import distinct_sketches

    e = load(spark, sf_dir, "events")
    return (
        distinct_sketches(e, "user_id", "event_type")
        .select("grp", "estimate", "n_rows")
        .orderBy("grp")
    )


def q_sketch_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gradeable invariant companion to q_sketch_distinct (the
    emb_pca_invariants pattern): the DataSketches HLL estimate is
    implementation-defined, but at lg_k=14 (rse ≈ 0.81%) the bound
    |estimate − exact| ≤ max(5%·exact, 5) is ~6σ — TRUE on any data
    the driver regenerates. Pure-integer predicate over the truncated
    estimate (the ±1 truncation is absorbed by the absolute floor);
    exact count and group size are oracle-exact columns."""
    from easydb_server_spark.operators.sketch import distinct_sketches

    e = load(spark, sf_dir, "events")
    sk = distinct_sketches(e, "user_id", "event_type").select("grp", "estimate", "n_rows")
    exact = e.groupBy(F.col("event_type").alias("grp")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    within = F.lit(20).cast("bigint") * F.abs(
        F.col("estimate").cast("bigint") - F.col("exact_users").cast("bigint")
    ) <= F.greatest(F.col("exact_users").cast("bigint"), F.lit(100).cast("bigint"))
    return (
        sk.join(exact, "grp")
        .select(
            "grp",
            F.col("exact_users").cast("long").alias("exact_users"),
            F.col("n_rows").cast("long").alias("n_rows"),
            within.alias("within_bound"),
        )
        .orderBy("grp")
    )


ORACLE_SKETCH_DISTINCT_BOUND = """
SELECT event_type AS grp,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS within_bound
FROM events
GROUP BY event_type
ORDER BY grp
"""


def q_sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF index (16 cells, nprobe=2 — the
    sim_topk_ivf geometry) against exact search for queries
    vec_id 20-29. Both searches are deterministic, so recall is a
    deterministic property of the cell geometry and the oracle
    replays it exactly — measuring ANN quality is itself an oracled
    operator, not a hand-waved sweep."""
    from easydb_server_spark.operators.similarity import ann_recall

    e = load(spark, sf_dir, "embeddings")
    q = e.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 30))
    return ann_recall(e, q, "embedding", "vec_id", k=3, n_cells=16, nprobe=2).orderBy("qid")


def _oracle_ann_recall() -> str:
    """Reuses ORACLE_SIM_TOPK_IVF's deterministic-k-means CTE chain
    (everything up to its final SELECT) and appends the brute-force
    ranking and the per-query intersection."""
    base = ORACLE_SIM_TOPK_IVF[: ORACLE_SIM_TOPK_IVF.index("SELECT qid, cid")]
    return (
        base
        + """, bscored AS (
  SELECT qv.vec_id AS qid, cv.vec_id AS cid,
         ROUND(list_cosine_similarity(cv.vec, qv.vec), 6) AS cosine
  FROM v qv JOIN v cv ON cv.vec_id != qv.vec_id
  WHERE qv.vec_id >= 20 AND qv.vec_id < 30
),
branked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS r
  FROM bscored
),
bf AS (SELECT qid, cid FROM branked WHERE r <= 3),
ivf AS (SELECT qid, cid FROM ranked WHERE rank <= 3),
hits AS (
  SELECT b.qid, COUNT(*) AS n
  FROM bf b JOIN ivf i ON i.qid = b.qid AND i.cid = b.cid
  GROUP BY b.qid
)
SELECT q.qid, CAST(3 AS INT) AS k,
       CAST(COALESCE(h.n, 0) AS INT) AS n_hits,
       ROUND(CAST(COALESCE(h.n, 0) AS DOUBLE) / 3, 6) AS recall
FROM (SELECT DISTINCT qid FROM bf) q
LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid
"""
    )


ORACLE_SIM_ANN_RECALL = _oracle_ann_recall()


def q_multimodal_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image features through the REAL GIF codec end-to-end: each
    doc_id becomes a deterministic palettized image (16 fixed palette
    colors, index grid ``(doc_id*3 + y*5 + x*7) mod 16``, w = 8 +
    doc_id%5, h = 6 + doc_id%4) ENCODED to genuine GIF89a/LZW bytes
    in an Arrow-batched stage, then decoded back and featurized
    (operators/gif.py). The oracle never sees bytes — it replays the
    palette arithmetic in closed form — so a hash match proves the
    LZW encoder/decoder pair is pixel-faithful, the same contract as
    the WAV/G.711 audio entries."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif, gif_decoder

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 8 + did % 5, 6 + did % 4
                y, x = np.mgrid[0:h, 0:w]
                idx = (did * 3 + y * 5 + x * 7) % 16
                feats = gif_decoder(encode_gif(pal[idx]))
                out.append(
                    (
                        did,
                        feats["width"],
                        feats["height"],
                        round(feats["mean_r"], 4),
                        round(feats["mean_g"], 4),
                        round(feats["mean_b"], 4),
                    )
                )
            yield pd.DataFrame(
                out, columns=["item_id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return d.mapInPandas(
        build,
        "item_id bigint, width int, height int, mean_r double, mean_g double, mean_b double",
    ).orderBy("item_id")


ORACLE_MULTIMODAL_GIF = """
WITH geo AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h FROM documents
),
px AS (
  SELECT g.doc_id, g.w, g.h,
         (g.doc_id * 3 + yy.y * 5 + xx.x * 7) % 16 AS i
  FROM geo g, UNNEST(generate_series(0, g.h - 1)) yy(y),
       UNNEST(generate_series(0, g.w - 1)) xx(x)
)
SELECT doc_id                                    AS item_id,
       CAST(MAX(w) AS INT)                       AS width,
       CAST(MAX(h) AS INT)                       AS height,
       ROUND(AVG((i * 16) % 256), 4)             AS mean_r,
       ROUND(AVG((i * 37) % 256), 4)             AS mean_g,
       ROUND(AVG((i * 73) % 256), 4)             AS mean_b
FROM px GROUP BY doc_id ORDER BY doc_id
"""


def q_text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (RedPajama-v2's
    repetition proxy). DEFLATE has no SQL form, so rows-only;
    the discriminating behavior and determinism are pytest-locked
    (tests/test_operators.py)."""
    d = load(spark, sf_dir, "documents")
    return T.compression_ratio(d, "text", "doc_id").orderBy("doc_id")


def q_text_compression_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gradeable companion to q_text_compression_ratio (the
    emb_pca_invariants pattern): DEFLATE byte counts are
    implementation-defined (rows-only), but three facts about the real
    zlib path hold on any data and replay in SQL:

    * ``raw_bytes`` — the UTF-8 byte length the operator feeds zlib —
      is oracle-exact (octet_length on both engines);
    * ``roundtrip_exact`` — decompress(compress(t)) == t;
    * ``doubling_subadditive`` — len(z(t+t)) < 2·len(z(t)): the second
      copy is window back-references, so compressing a doubled text
      can never cost double (docs capped at 8192 chars so the 32 KB
      DEFLATE window always spans the first copy);
    * ``within_deflate_bound`` — compressed ≤ raw + 11 + 5·ceil(raw/
      16383), zlib's stored-block worst case.

    All three booleans replay as constant TRUE."""
    import pandas as pd

    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.length("text") >= 1) & (F.length("text") <= 8192))
        .select("doc_id", "text")
    )

    def check(batches):
        import zlib

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                z = zlib.compress(raw, 6)
                z2 = zlib.compress(raw + raw, 6)
                out.append(
                    (
                        int(doc_id),
                        len(raw),
                        zlib.decompress(z) == raw,
                        len(z2) < 2 * len(z),
                        len(z) <= len(raw) + 11 + 5 * ((len(raw) + 16382) // 16383),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "raw_bytes",
                    "roundtrip_exact",
                    "doubling_subadditive",
                    "within_deflate_bound",
                ],
            )

    schema = (
        "doc_id bigint, raw_bytes bigint, roundtrip_exact boolean, "
        "doubling_subadditive boolean, within_deflate_bound boolean"
    )
    return d.mapInPandas(check, schema).orderBy("doc_id")


ORACLE_TEXT_COMPRESSION_INVARIANTS = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS raw_bytes,
       TRUE AS roundtrip_exact,
       TRUE AS doubling_subadditive,
       TRUE AS within_deflate_bound
FROM documents
WHERE text IS NOT NULL AND length(text) >= 1 AND length(text) <= 8192
ORDER BY doc_id
"""


def q_multimodal_gif_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF resize end-to-end through the REAL pipeline: the
    multimodal_gif synthetic images flow through
    ``resize_images(codec='gif')`` (decode -> nearest-neighbor -> LZW
    re-encode) and are decoded AGAIN for features. The oracle replays
    the nearest-neighbor index arithmetic ((Y*h)//4, (X*w)//5) on the
    palette recipe in closed form, so a hash match proves the full
    decode->resize->encode->decode chain is pixel-faithful."""
    import pandas as pd

    from easydb_server_spark.operators.multimodal import resize_images

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 8 + did % 5, 6 + did % 4
                y, x = np.mgrid[0:h, 0:w]
                idx = (did * 3 + y * 5 + x * 7) % 16
                out.append((did, encode_gif(pal[idx])))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    blobs = d.mapInPandas(build, "item_id bigint, payload binary")
    resized = resize_images(blobs, "payload", "item_id", 5, 4, codec="gif")

    def feats(batches):
        from easydb_server_spark.operators.gif import gif_decoder

        for pdf in batches:
            out = []
            for item_id, blob in zip(pdf["item_id"], pdf["payload"]):
                f = gif_decoder(bytes(blob))
                out.append(
                    (
                        item_id, f["width"], f["height"],
                        round(f["mean_r"], 4), round(f["mean_g"], 4), round(f["mean_b"], 4),
                    )
                )
            yield pd.DataFrame(
                out, columns=["item_id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return resized.mapInPandas(
        feats,
        "item_id bigint, width int, height int, mean_r double, mean_g double, mean_b double",
    ).orderBy("item_id")


ORACLE_MULTIMODAL_GIF_RESIZE = """
WITH geo AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h FROM documents
),
px AS (
  SELECT g.doc_id,
         (g.doc_id * 3 + ((yy.y * g.h) // 4) * 5 + ((xx.x * g.w) // 5) * 7) % 16 AS i
  FROM geo g, UNNEST(generate_series(0, 3)) yy(y),
       UNNEST(generate_series(0, 4)) xx(x)
)
SELECT doc_id                        AS item_id,
       CAST(5 AS INT)                AS width,
       CAST(4 AS INT)                AS height,
       ROUND(AVG((i * 16) % 256), 4) AS mean_r,
       ROUND(AVG((i * 37) % 256), 4) AS mean_g,
       ROUND(AVG((i * 73) % 256), 4) AS mean_b
FROM px GROUP BY doc_id ORDER BY doc_id
"""


def q_text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM training (2 hard-EM iterations, vocab 64) over the
    documents corpus — rows-only BY DESIGN: the learned scores are
    round(ln(count/total)*1e6), and ln() may differ in the last ulp
    across engines' libms, which can flip a rounded score and hence a
    Viterbi tie during the NEXT iteration's segmentation — so an
    "exact" cross-engine train oracle would be unsound (flaky at the
    rounding boundary), unlike the apply half whose DP is pure integer
    arithmetic and IS oracled (text_unigram_tokenize). Training
    behavior (learns real subwords, deterministic, feeds apply) is
    pytest-locked in tests/test_unigram.py."""
    from easydb_server_spark.operators.unigram import unigram_train

    d = load(spark, sf_dir, "documents")
    return unigram_train(d, "text", vocab_size=64, iterations=2, seed_size=2000)


def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume z-scores per event type (operators/profile.py
    bucket_anomalies). Mean/variance derive from exact integer sums in
    one fixed float expression, so the oracle's identical arithmetic
    is bit-equal — anomaly detection as an exactly-verified operator."""
    from easydb_server_spark.operators.profile import bucket_anomalies

    e = load(spark, sf_dir, "events")
    return bucket_anomalies(e, "ts", "event_type").orderBy("grp", "window_start")


ORACLE_TS_ANOMALY = """
WITH counts AS (
  SELECT event_type AS grp, time_bucket(INTERVAL 1 HOUR, ts) AS w,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT grp, CAST(SUM(n) AS BIGINT) AS sum_n,
         CAST(SUM(n * n) AS BIGINT) AS sum_nn,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM counts GROUP BY grp
),
scored AS (
  SELECT c.grp, c.w, c.n,
         CASE WHEN SQRT((s.sum_nn - s.sum_n * s.sum_n / CAST(s.k AS DOUBLE)) / s.k) = 0
              THEN 0.0
              ELSE ROUND((c.n - CAST(s.sum_n AS DOUBLE) / s.k)
                   / SQRT((s.sum_nn - s.sum_n * s.sum_n / CAST(s.k AS DOUBLE)) / s.k), 6)
         END AS z
  FROM counts c JOIN stats s USING (grp)
)
SELECT grp, CAST(w AS VARCHAR) AS window_start, n, z,
       ABS(z) >= 2.0 AS is_anomaly
FROM scored ORDER BY grp, window_start
"""


def q_text_code_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-line code-likeness over synthetic multi-line pages: every
    other doc gets an injected code block (indented call, brace close,
    an import line), the rest an extra prose line — so the entry
    discriminates. The oracle replays the four line heuristics with
    the same RE2/Java-common regexes via list_filter."""
    d = load(spark, sf_dir, "documents")
    built = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat_ws(
                "\n",
                F.col("text"),
                F.lit("import os"),
                F.lit("    run(batch);"),
                F.lit("}"),
            ),
        )
        .otherwise(F.concat_ws("\n", F.col("text"), F.lit("plain prose tail")))
        .alias("text"),
    )
    return T.code_fraction(built, "text", "doc_id").orderBy("doc_id")


ORACLE_TEXT_CODE_FRACTION = r"""
WITH built AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN text || chr(10) || 'import os' || chr(10) ||
                   '    run(batch);' || chr(10) || '}'
              ELSE text || chr(10) || 'plain prose tail' END AS t
  FROM documents
),
l AS (SELECT doc_id, string_split(t, chr(10)) AS ls, t FROM built),
f AS (
  SELECT doc_id, t, CAST(len(ls) AS INT) AS n_lines,
         CAST(len(list_filter(ls, x ->
              regexp_matches(x, '^[ \t]{4,}')
           OR regexp_matches(x, '[;{}][ \t]*$')
           OR regexp_matches(x, '^(def |class |import |from |return |for |while |if |#include|function |var |const |let )')
           OR regexp_matches(x, '=>|==|!=|::|\(\)'))) AS INT) AS n_code_lines
  FROM l
)
SELECT doc_id, n_lines, n_code_lines,
       (CAST((CASE WHEN (n_code_lines) < 0 THEN -(((((abs(CAST(n_code_lines AS BIGINT)) // (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100 + ((abs(CAST(n_code_lines AS BIGINT)) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100 + ((((abs(CAST(n_code_lines AS BIGINT)) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100 + ((((((abs(CAST(n_code_lines AS BIGINT)) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_lines, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_code_lines AS BIGINT)) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) >= (CAST(GREATEST(n_lines, 1) AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(n_code_lines AS BIGINT)) // (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100 + ((abs(CAST(n_code_lines AS BIGINT)) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100 + ((((abs(CAST(n_code_lines AS BIGINT)) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100 + ((((((abs(CAST(n_code_lines AS BIGINT)) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) // (CAST(GREATEST(n_lines, 1) AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(n_code_lines AS BIGINT)) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) * 100) % (CAST(GREATEST(n_lines, 1) AS BIGINT))) >= (CAST(GREATEST(n_lines, 1) AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS code_frac,
       contains(t, '```') AS has_fence
FROM f ORDER BY doc_id
"""


def q_sketch_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe (operators/bloom.py): the filter
    is built over the even-doc_id half of the corpus's content
    digests (m=2048 bits, k=3 — small on purpose, so real false
    positives occur at sf0.01 and the entry exercises the FP path,
    not just exact membership), then every document probes it. The
    md5 bit positions, 32-bit word packing, and per-probe bool_and
    are all replayed exactly by the DuckDB oracle — the filter is
    deterministic; only its error vs true membership is
    probabilistic."""
    from easydb_server_spark.operators.bloom import bloom_build, bloom_probe

    d = load(spark, sf_dir, "documents")
    members = d.where(F.col("doc_id") % 2 == 0).select(F.md5("text").alias("h"))
    bl = bloom_build(members, "h", m_bits=2048, k=3, seed="bl1")
    probed = bloom_probe(
        d.select("doc_id", F.md5("text").alias("h")), "h", bl, "doc_id",
        m_bits=2048, k=3, seed="bl1",
    )
    return probed.select("doc_id", "maybe_member").orderBy("doc_id")


ORACLE_SKETCH_BLOOM_PROBE = """
WITH keys AS (SELECT doc_id, md5(text) AS h FROM documents),
mem AS (
  SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL
),
bits AS (
  SELECT DISTINCT
    ('0x' || substr(md5('bl1:' || j || ':' || h), 1, 15))::BIGINT % 2048 AS pos
  FROM mem, UNNEST(generate_series(0, 2)) t(j)
),
words AS (
  SELECT pos // 32 AS word_idx,
         BIT_OR(1::BIGINT << CAST(pos % 32 AS INT)) AS word
  FROM bits GROUP BY 1
),
probes AS (
  SELECT k.doc_id,
    ('0x' || substr(md5('bl1:' || j || ':' || k.h), 1, 15))::BIGINT % 2048 AS pos
  FROM keys k, UNNEST(generate_series(0, 2)) t(j)
  WHERE k.h IS NOT NULL
),
verd AS (
  SELECT p.doc_id,
         BOOL_AND(w.word IS NOT NULL
                  AND ((w.word >> CAST(p.pos % 32 AS INT)) & 1) = 1) AS mm
  FROM probes p LEFT JOIN words w ON w.word_idx = p.pos // 32
  GROUP BY 1
)
SELECT k.doc_id, COALESCE(v.mm, FALSE) AS maybe_member
FROM keys k LEFT JOIN verd v USING (doc_id)
ORDER BY doc_id
"""


def q_dedup_bloom_admits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup: same fixture as
    dedup_incremental (even docs are the ingested corpus; the batch
    re-crawls 30 of them), but the batch probes a broadcast bloom of
    the index digests FIRST — bloom-negative rows admit map-side and
    only the bloom-positive slice reaches the index anti-join. No
    false negatives means the admit list is bit-identical to the
    plain anti-join, which is exactly what the oracle computes (the
    bloom changes cost, never results; the FP path is oracled by
    sketch_bloom_probe and the plan discipline is pytest-locked)."""
    from easydb_server_spark.operators.bloom import bloom_build, bloom_prefilter_admits

    d = load(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 2 == 0)
    idx = corpus.select(F.md5("text").alias("content_hash")).distinct()
    bl = bloom_build(idx, "content_hash", m_bits=1 << 14, k=5, seed="adm1")
    recrawl = d.where(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 30000).alias("doc_id"), "text"
    )
    batch = (
        d.where(F.col("doc_id") % 2 == 1).select("doc_id", "text").unionAll(recrawl)
    )
    return bloom_prefilter_admits(
        batch, "text", "doc_id", bl, idx, m_bits=1 << 14, k=5, seed="adm1"
    ).orderBy("doc_id")


ORACLE_DEDUP_BLOOM_ADMITS = """
WITH idx AS (
  SELECT DISTINCT md5(text) AS content_hash FROM documents WHERE doc_id % 2 = 0
),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 30000, text FROM documents WHERE doc_id < 60
),
batch_first AS (
  SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id
  FROM batch GROUP BY md5(text)
)
SELECT b.doc_id, b.content_hash
FROM batch_first b
WHERE b.content_hash NOT IN (SELECT content_hash FROM idx)
ORDER BY doc_id
"""


def q_sketch_cm_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates (operators/sketch.py) for the
    corpus's 30 most frequent words, from a depth=4 x width=256
    sketch of the exploded word stream — width deliberately small so
    bucket collisions (the overestimate path) are live at sf0.01.
    The sketch is deterministic md5 arithmetic, so the oracle replays
    every counter and every min exactly; the one-sided error bound
    (est >= true, always) is pytest-locked separately. The candidate
    top-30 comes from orderBy+limit — TakeOrderedAndProject, the
    distributed top-k, never a single-partition global window."""
    from easydb_server_spark.operators.sketch import cm_build, cm_estimate

    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.lower("text"), " ")).alias("w")).where(
        F.col("w") != ""
    )
    cm = cm_build(words, "w", depth=4, width=256, seed="cm1")
    true = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = true.orderBy(F.col("c").desc(), F.col("w").asc()).limit(30).select("w")
    return cm_estimate(cm, top, "w", depth=4, width=256, seed="cm1").orderBy("w")


ORACLE_SKETCH_CM_WORDS = """
WITH wall AS (
  SELECT UNNEST(string_split(lower(text), ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
wf AS (SELECT w FROM wall WHERE w <> ''),
cm AS (
  SELECT t.r,
         ('0x' || substr(md5('cm1:' || t.r || ':' || w), 1, 15))::BIGINT % 256 AS bucket,
         COUNT(*) AS cnt
  FROM wf, UNNEST(generate_series(0, 3)) t(r)
  GROUP BY 1, 2
),
keys AS (
  SELECT w FROM (SELECT w, COUNT(*) AS c FROM wf GROUP BY 1)
  ORDER BY c DESC, w LIMIT 30
),
probe AS (
  SELECT k.w, t.r,
    ('0x' || substr(md5('cm1:' || t.r || ':' || k.w), 1, 15))::BIGINT % 256 AS bucket
  FROM keys k, UNNEST(generate_series(0, 3)) t(r)
)
SELECT p.w, MIN(COALESCE(cm.cnt, 0)) AS est
FROM probe p LEFT JOIN cm USING (r, bucket)
GROUP BY p.w
ORDER BY w
"""


# ---------- product quantization (operators/pq.py) ----------

# the from-``subs`` half of the PQ derivation (seeded init, one Lloyd
# round, encode) — shared by the raw-vector oracles (pq_codes /
# pq_adc_topk) and the residual-vector oracle (ivfpq_adc_topk), which
# differ only in what the ``subs`` CTE slices
_PQ_FROM_SUBS = """
init AS (
  SELECT sub, r - 1 AS code, svec AS centroid FROM (
    SELECT sub, svec,
           ROW_NUMBER() OVER (PARTITION BY sub
                              ORDER BY md5(CAST(cid AS VARCHAR)), cid) AS r
    FROM subs
  ) WHERE r <= 8
),
a0 AS (
  SELECT cid, sub, code FROM (
    SELECT s.cid, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.cid, s.sub
                              ORDER BY ROUND(list_dot_product(s.svec, c.centroid), 6) DESC,
                                       c.code) AS r
    FROM subs s JOIN init c ON c.sub = s.sub
  ) WHERE r = 1
),
upd AS (
  SELECT a0.sub, a0.code, t.i AS pos, ROUND(AVG(s.svec[t.i]), 5) AS m
  FROM a0 JOIN subs s ON s.cid = a0.cid AND s.sub = a0.sub,
       UNNEST(generate_series(1, 16)) t(i)
  GROUP BY a0.sub, a0.code, t.i
),
newc AS (SELECT sub, code, list(m ORDER BY pos) AS centroid FROM upd GROUP BY sub, code),
cb AS (
  SELECT i.sub, i.code, COALESCE(n.centroid, i.centroid) AS centroid
  FROM init i LEFT JOIN newc n ON n.sub = i.sub AND n.code = i.code
),
enc AS (
  SELECT cid, sub, code FROM (
    SELECT s.cid, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.cid, s.sub
                              ORDER BY ROUND(list_dot_product(s.svec, c.centroid), 6) DESC,
                                       c.code) AS r
    FROM subs s JOIN cb c ON c.sub = s.sub
  ) WHERE r = 1
)
"""

_PQ_CB_CTES = (
    """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
subs AS (
  SELECT vec_id AS cid, t.s AS sub, list_slice(e, t.s * 16 + 1, t.s * 16 + 16) AS svec
  FROM v, UNNEST(generate_series(0, 3)) t(s)
),"""
    + _PQ_FROM_SUBS
)


def _pq_artifacts(spark: SparkSession, sf_dir: str):
    from easydb_server_spark.operators import pq as PQ

    e = load(spark, sf_dir, "embeddings")
    cb = PQ.pq_train(e, "embedding", "vec_id", m=4, k=8, n_iters=1)
    enc = PQ.pq_encode(e, "embedding", "vec_id", cb, m=4)
    return e, cb, enc


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization train + encode over the embedding corpus
    (m=4 subspaces × k=8 codes, one Lloyd iteration): each 64-dim
    vector compresses to 4 one-byte codes. The oracle replays the
    whole derivation — md5-seeded per-subspace init, rounded-dot
    argmax assignment (ties by code), rounded-mean Lloyd update with
    empty-cell carry — so every emitted (vec_id, sub, code) matches
    bit-for-bit. Scale shape (operators/pq.py): the codebook is m·k
    rows broadcast; training shuffles only (sub, code, pos) means;
    encoding is map-only after the subspace explode."""
    _e, _cb, enc = _pq_artifacts(spark, sf_dir)
    return enc.select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    ).orderBy("vec_id", "sub")


ORACLE_PQ_CODES = (
    _PQ_CB_CTES
    + """
SELECT cid AS vec_id, CAST(sub AS INT) AS sub, CAST(code AS INT) AS code
FROM enc
ORDER BY vec_id, sub
"""
)


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-5 for 8 corpus queries against the
    PQ-encoded corpus: per (query, candidate), the score is the sum of
    m LUT lookups — each lookup quantized to INT64 micro-units before
    summation (order-free; the repo fixed-point discipline), one float
    division at the end. The oracle replays codebook, codes, LUT, and
    the integer score arithmetic exactly."""
    from easydb_server_spark.operators import pq as PQ

    e, cb, enc = _pq_artifacts(spark, sf_dir)
    q = e.where(F.col("vec_id") < 8)
    return PQ.pq_adc_topk(q, enc, cb, "embedding", "vec_id", m=4, k_top=5).orderBy(
        "qid", "rank"
    )


ORACLE_PQ_ADC_TOPK = (
    _PQ_CB_CTES
    + """,
lut AS (
  SELECT s.cid AS qid, s.sub, c.code,
         CAST(ROUND(list_dot_product(s.svec, c.centroid) * 1000000.0, 0) AS BIGINT)
           AS part_units
  FROM subs s JOIN cb c ON c.sub = s.sub
  WHERE s.cid < 8
),
scored AS (
  SELECT l.qid, e2.cid, SUM(l.part_units) AS adc_units
  FROM enc e2 JOIN lut l ON l.sub = e2.sub AND l.code = e2.code
  WHERE e2.cid != l.qid
  GROUP BY l.qid, e2.cid
),
ranked AS (
  SELECT qid, cid, adc_units,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_units DESC, cid) AS rank
  FROM scored
)
SELECT qid, cid,
       ROUND(CAST(adc_units AS DOUBLE) / 1000000.0, 6) AS adc_score,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY qid, rank
"""
)


def q_sim_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVFADC (8 cells, nprobe=2, m=4 x k=8 residual PQ —
    the ivfpq_adc_topk geometry) against exact cosine search for 8
    corpus queries. The ANN stack has TWO approximation layers (coarse
    pruning, residual quantization); sim_ann_recall grades only the
    first — this grades the composition. Both searches are
    deterministic, so the recall of the geometry is an oracled fact:
    the oracle replays the full IVFADC derivation AND the brute-force
    ranking and intersects them."""
    from easydb_server_spark.operators.pq import ivfpq_recall

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    return ivfpq_recall(
        e, q, "embedding", "vec_id", k_top=5, m=4, k=8, n_cells=8, nprobe=2
    ).orderBy("qid")


def _oracle_ivfpq_recall() -> str:
    """ORACLE_IVFPQ_ADC_TOPK's full derivation chain (everything up to
    its final SELECT) + the brute-force ranking + the intersection."""
    base = ORACLE_IVFPQ_ADC_TOPK[: ORACLE_IVFPQ_ADC_TOPK.rindex("SELECT qid, cid,")]
    return (
        base
        + """, bscored AS (
  SELECT qv.vec_id AS qid, cv.vec_id AS cid,
         ROUND(list_cosine_similarity(cv.e, qv.e), 6) AS cosine
  FROM v qv JOIN v cv ON cv.vec_id != qv.vec_id
  WHERE qv.vec_id < 8
),
branked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS r
  FROM bscored
),
bf AS (SELECT qid, cid FROM branked WHERE r <= 5),
ivfpq AS (SELECT qid, cid FROM ranked WHERE rank <= 5),
hits AS (
  SELECT b.qid, COUNT(*) AS n
  FROM bf b JOIN ivfpq i ON i.qid = b.qid AND i.cid = b.cid
  GROUP BY b.qid
)
SELECT q.qid, CAST(5 AS INT) AS k,
       CAST(COALESCE(h.n, 0) AS INT) AS n_hits,
       (CAST((CASE WHEN (COALESCE(h.n, 0)) < 0 THEN -(((((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) // (CAST(5 AS BIGINT))) * 100 + ((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) % (CAST(5 AS BIGINT))) * 100) // (CAST(5 AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) // (CAST(5 AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) // (CAST(5 AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) >= (CAST(5 AS BIGINT)) THEN 1 ELSE 0 END)) ELSE (((((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) // (CAST(5 AS BIGINT))) * 100 + ((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) % (CAST(5 AS BIGINT))) * 100) // (CAST(5 AS BIGINT))) * 100 + ((((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) // (CAST(5 AS BIGINT))) * 100 + ((((((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) // (CAST(5 AS BIGINT))) + (CASE WHEN 2 * (((((((abs(CAST(COALESCE(h.n, 0) AS BIGINT)) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) * 100) % (CAST(5 AS BIGINT))) >= (CAST(5 AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 1000000.0) AS recall
FROM (SELECT DISTINCT qid FROM bf) q
LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid
"""
    )


def q_pq_store_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ store lifecycle end-to-end: train+write on the first 40
    vectors, append a batch that RE-CRAWLS ids 0..9 (their vectors
    replaced by vec_id+40's embeddings) plus 10 brand-new ids, compact
    (newest seq wins), then serve brute-ADC top-5 for 4 queries from
    the compacted store. The oracle replays the final state directly:
    codebook trained on the base slice, codes for the post-compaction
    corpus (modified 0..9 + untouched 10..39 + new 1000..1009), LUT
    and INT64 micro-unit scores — so the append/compact semantics are
    what is actually graded, not just the search. Scale shape
    (operators/pq.py store section): appends encode only the batch
    against the frozen broadcast codebook, compaction rewrites
    hash-bucket partitions, and nothing re-reads raw corpus vectors."""
    from easydb_server_spark.operators import pq as PQ

    e = load(spark, sf_dir, "embeddings")
    tbl = "pq_store_conf"
    base = e.where(F.col("vec_id") < 40)
    PQ.write_pq_store(base, "embedding", "vec_id", tbl, m=4, k=8)
    shifted = e.where((F.col("vec_id") >= 40) & (F.col("vec_id") < 50))
    recrawl = shifted.select((F.col("vec_id") - 40).alias("vec_id"), "embedding")
    new = shifted.select((F.col("vec_id") + 960).alias("vec_id"), "embedding")
    PQ.append_to_pq_store(spark, recrawl.unionAll(new), "embedding", "vec_id", tbl)
    PQ.compact_pq_store(spark, tbl)
    q = e.where(F.col("vec_id") < 4)
    return PQ.pq_store_adc_topk(spark, q, "embedding", "vec_id", tbl, k_top=5).orderBy(
        "qid", "rank"
    )


_PQ_STORE_TRAIN_CTES = """
WITH vbase AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 40
),
subs AS (
  SELECT cid, t.s AS sub, list_slice(e, t.s * 16 + 1, t.s * 16 + 16) AS svec
  FROM vbase, UNNEST(generate_series(0, 3)) t(s)
),
init AS (
  SELECT sub, r - 1 AS code, svec AS centroid FROM (
    SELECT sub, svec,
           ROW_NUMBER() OVER (PARTITION BY sub
                              ORDER BY md5(CAST(cid AS VARCHAR)), cid) AS r
    FROM subs
  ) WHERE r <= 8
),
a0 AS (
  SELECT cid, sub, code FROM (
    SELECT s.cid, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.cid, s.sub
                              ORDER BY ROUND(list_dot_product(s.svec, c.centroid), 6) DESC,
                                       c.code) AS r
    FROM subs s JOIN init c ON c.sub = s.sub
  ) WHERE r = 1
),
upd AS (
  SELECT a0.sub, a0.code, t.i AS pos, ROUND(AVG(s.svec[t.i]), 5) AS m
  FROM a0 JOIN subs s ON s.cid = a0.cid AND s.sub = a0.sub,
       UNNEST(generate_series(1, 16)) t(i)
  GROUP BY a0.sub, a0.code, t.i
),
newc AS (SELECT sub, code, list(m ORDER BY pos) AS centroid FROM upd GROUP BY sub, code),
cb AS (
  SELECT i.sub, i.code, COALESCE(n.centroid, i.centroid) AS centroid
  FROM init i LEFT JOIN newc n ON n.sub = i.sub AND n.code = i.code
)"""


ORACLE_PQ_STORE_LIFECYCLE = (
    _PQ_STORE_TRAIN_CTES
    + """,
vstore AS (
  SELECT b.vec_id AS cid, CAST(n.embedding AS DOUBLE[]) AS e
  FROM embeddings b JOIN embeddings n ON n.vec_id = b.vec_id + 40
  WHERE b.vec_id < 10
  UNION ALL
  SELECT vec_id, CAST(embedding AS DOUBLE[])
  FROM embeddings WHERE vec_id >= 10 AND vec_id < 40
  UNION ALL
  SELECT vec_id + 960, CAST(embedding AS DOUBLE[])
  FROM embeddings WHERE vec_id >= 40 AND vec_id < 50
),
ssubs AS (
  SELECT cid, t.s AS sub, list_slice(e, t.s * 16 + 1, t.s * 16 + 16) AS svec
  FROM vstore, UNNEST(generate_series(0, 3)) t(s)
),
enc AS (
  SELECT cid, sub, code FROM (
    SELECT s.cid, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.cid, s.sub
                              ORDER BY ROUND(list_dot_product(s.svec, c.centroid), 6) DESC,
                                       c.code) AS r
    FROM ssubs s JOIN cb c ON c.sub = s.sub
  ) WHERE r = 1
),
qsubs AS (
  SELECT vec_id AS qid, t.s AS sub,
         list_slice(CAST(embedding AS DOUBLE[]), t.s * 16 + 1, t.s * 16 + 16) AS svec
  FROM embeddings, UNNEST(generate_series(0, 3)) t(s)
  WHERE vec_id < 4
),
lut AS (
  SELECT s.qid, s.sub, c.code,
         CAST(ROUND(list_dot_product(s.svec, c.centroid) * 1000000.0, 0) AS BIGINT)
           AS part_units
  FROM qsubs s JOIN cb c ON c.sub = s.sub
),
scored AS (
  SELECT l.qid, e2.cid, SUM(l.part_units) AS adc_units
  FROM enc e2 JOIN lut l ON l.sub = e2.sub AND l.code = e2.code
  WHERE e2.cid != l.qid
  GROUP BY l.qid, e2.cid
),
ranked AS (
  SELECT qid, cid, adc_units,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_units DESC, cid) AS rank
  FROM scored
)
SELECT qid, cid,
       ROUND(CAST(adc_units AS DOUBLE) / 1000000.0, 6) AS adc_score,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY qid, rank
"""
)


def q_emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the embedding corpus (k=4, sign-fixed
    components ordered by descending eigenvalue), exploded to
    (id, pos, value) scalar rows. Rows-only by design: the covariance
    input is now bit-deterministic (fixed-point two-pass,
    operators/similarity.py:emb_covariance — driver-oracled), but the
    d×d eigendecomposition is LAPACK float with no SQL-expressible
    replay, the documented oracle-exception class. The projection's
    semantics are pytest-locked instead: descending-variance order,
    component orthonormality via the projected covariance, whitening
    unit-variance, and run-to-run determinism (tests/test_r10_fixes.py).
    """
    e = load(spark, sf_dir, "embeddings")
    return S.emb_pca(e, "embedding", "vec_id", k=4).orderBy("id", "pos")


def q_emb_pca_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gradeable companion to q_emb_pca: the eigendecomposition
    itself has no SQL replay, but its correctness INVARIANTS round
    exactly to zero on any data — component orthonormality (gram),
    the eigen equation over the same distributed covariance
    (rayleigh), descending eigenvalue order (eig_order), and norm
    preservation of the full-rank distributed Arrow projection
    (isometry). The oracle is the constant zero table over the same
    (chk, pos) grid, with the component count read from the data so
    regenerated fixtures still grade."""
    e = load(spark, sf_dir, "embeddings")
    return S.emb_pca_invariants(e, "embedding", "vec_id").orderBy("chk", "pos")


ORACLE_EMB_PCA_INVARIANTS = """
WITH dim AS (SELECT CAST(MAX(len(embedding)) AS INT) AS d FROM embeddings),
comps AS (SELECT UNNEST(generate_series(0, d - 1)) AS pos FROM dim)
SELECT chk, CAST(pos AS INT) AS pos, residual FROM (
  SELECT 'gram' AS chk, pos, 0.0 AS residual FROM comps
  UNION ALL
  SELECT 'rayleigh', pos, 0.0 FROM comps
  UNION ALL
  SELECT 'eig_order', -1, 0.0
  UNION ALL
  SELECT 'isometry', -1, 0.0
)
ORDER BY chk, pos
"""


def q_audio_spectrogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STFT spectral summary over real WAV clips (the multimodal_audio
    sample recipe encoded through the stdlib codec): dominant bin, its
    dB level, spectral centroid. Rows-only by design: float FFT has no
    exact cross-engine form (libm cos/sin last-ulp differences) — the
    documented oracle-exception class; analytically-known signals are
    pytest-locked instead (a pure tone at bin k must dominate bin k,
    tests/test_g711_spectral.py)."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import encode_wav

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 100 + did % 50
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)
                out.append((did, encode_wav(s, 8000)))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    blobs = d.mapInPandas(build, "item_id bigint, payload binary")
    from easydb_server_spark.operators.multimodal import audio_spectrogram

    return audio_spectrogram(blobs, "payload", "item_id").orderBy("item_id")


def q_audio_spectrogram_tone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gradeable companion to q_audio_spectrogram (the
    emb_pca_invariants pattern): FFT magnitudes are float and stay
    rows-only, but a PURE TONE at an exact FFT bin has an
    analytically-known dominant bin — so the WAV encode → decode →
    Hann STFT → argmax pipeline is graded end-to-end against a
    closed-form oracle. Each doc_id becomes a 256-sample int16 tone at
    bin b = 1 + doc_id % 30 of the 64-point frame (bins 1..30: inside
    the rfft range, away from DC/Nyquist edges where leakage could
    tie); n_frames is the closed form (256-64)/32 + 1 = 7. Float
    columns (dB level, centroid) are deliberately not selected."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import encode_wav

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                b = 1 + did % 30
                i = np.arange(256, dtype=np.float64)
                s = np.round(20000.0 * np.sin(2.0 * np.pi * b * i / 64.0)).astype(
                    np.int16
                )
                out.append((did, encode_wav(s, 8000)))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    blobs = d.mapInPandas(build, "item_id bigint, payload binary")
    from easydb_server_spark.operators.multimodal import audio_spectrogram

    return (
        audio_spectrogram(blobs, "payload", "item_id")
        .select(
            "item_id",
            F.col("n_frames").cast("int").alias("n_frames"),
            F.col("dominant_bin").cast("int").alias("dominant_bin"),
        )
        .orderBy("item_id")
    )


ORACLE_AUDIO_SPECTROGRAM_TONE = """
SELECT doc_id AS item_id,
       CAST(7 AS INT) AS n_frames,
       CAST(1 + doc_id % 30 AS INT) AS dominant_bin
FROM documents
ORDER BY item_id
"""


def q_multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF frame sampling end-to-end through the REAL codec:
    each doc_id becomes a T-frame animation (T = 3 + doc_id % 4;
    frame f is the palette grid ``(doc_id*3 + f*11 + y*5 + x*7) mod
    16``, w = 8 + doc_id%5, h = 6 + doc_id%4) encoded with
    encode_gif_animated (per-frame GCEs, global palette, real LZW);
    sample_frames decodes + composites every frame, picks 3 evenly
    (frame ``i·T//3``), and re-encodes each as a standalone GIF whose
    features are extracted by gif_decoder. The oracle never sees bytes
    — it replays the frame recipe and the sampling index arithmetic in
    closed form — so a hash match proves multi-frame decode,
    compositing, sampling, and re-encode are pixel-faithful."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id")

    # r16 (guide §4): build → decode → sample → re-encode → features
    # all run fused in ONE Arrow stage — neither the animated blob nor
    # the sampled frame bytes ever cross the JVM↔Python boundary (the
    # three-stage chain spent ~1.1 s of its 2.0 s drain on the two
    # extra Python runner hops). Same codec calls in the same order,
    # same Python rounding — the sampling/feature loop is the SHARED
    # operator core (multimodal.frame_feature_rows, the body of
    # sample_frame_features), so this is value-identical to
    # sample_frames + gif_decoder over the built blobs.
    def build_feats(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif_animated
        from easydb_server_spark.operators.multimodal import frame_feature_rows

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h, t = 8 + did % 5, 6 + did % 4, 3 + did % 4
                y, x = np.mgrid[0:h, 0:w]
                frames = [pal[(did * 3 + f * 11 + y * 5 + x * 7) % 16] for f in range(t)]
                out.extend(frame_feature_rows(did, encode_gif_animated(frames), 3))
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return (
        spread(d)
        .mapInPandas(
            build_feats,
            "item_id bigint, frame_idx int, width int, height int,"
            " mean_r double, mean_g double, mean_b double",
        )
        .orderBy("item_id", "frame_idx")
    )


ORACLE_MULTIMODAL_GIF_FRAMES = """
WITH geo AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
         3 + doc_id % 4 AS t
  FROM documents
),
sel AS (
  SELECT g.doc_id, g.w, g.h, s.i AS frame_idx, (s.i * g.t) // 3 AS f
  FROM geo g, UNNEST(generate_series(0, 2)) s(i)
),
px AS (
  SELECT s.doc_id, s.frame_idx, s.w, s.h,
         (s.doc_id * 3 + s.f * 11 + yy.y * 5 + xx.x * 7) % 16 AS i
  FROM sel s, UNNEST(generate_series(0, s.h - 1)) yy(y),
       UNNEST(generate_series(0, s.w - 1)) xx(x)
)
SELECT doc_id                                   AS item_id,
       CAST(frame_idx AS INT)                   AS frame_idx,
       CAST(MAX(w) AS INT)                      AS width,
       CAST(MAX(h) AS INT)                      AS height,
       ROUND(AVG((i * 16) % 256), 4)            AS mean_r,
       ROUND(AVG((i * 37) % 256), 4)            AS mean_g,
       ROUND(AVG((i * 73) % 256), 4)            AS mean_b
FROM px GROUP BY doc_id, frame_idx
ORDER BY item_id, frame_idx
"""


def q_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC end-to-end (operators/pq.py:ivfpq_adc_topk): 8 coarse
    IVF cells (deterministic k-means, 1 Lloyd round), product
    quantization of the RESIDUALS (m=4 × k=8, 1 round), nprobe=2
    search for 8 corpus queries scored as coarse-dot + m residual-LUT
    lookups in INT64 micro-units. The oracle replays the entire
    derivation — coarse centroids, assignments, residuals, residual
    codebook, codes, LUT, score arithmetic — bit-for-bit."""
    from easydb_server_spark.operators.pq import ivfpq_adc_topk

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    return ivfpq_adc_topk(
        e, q, "embedding", "vec_id", m=4, k=8, n_cells=8, nprobe=2, k_top=5
    ).orderBy("qid", "rank")


ORACLE_IVFPQ_ADC_TOPK = (
    """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cinit AS (
  SELECT vec_id AS cell, e AS centroid FROM v
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
ca0 AS (
  SELECT cid, cell FROM (
    SELECT v.vec_id AS cid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_dot_product(v.e, c.centroid), 6) DESC,
                                       c.cell) AS r
    FROM v CROSS JOIN cinit c
  ) WHERE r = 1
),
cupd AS (
  SELECT ca0.cell, t.i AS pos, ROUND(AVG(v.e[t.i]), 5) AS m
  FROM ca0 JOIN v ON v.vec_id = ca0.cid,
       UNNEST(generate_series(1, 64)) t(i)
  GROUP BY ca0.cell, t.i
),
cnew AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM cupd GROUP BY cell),
cents AS (
  SELECT i.cell, COALESCE(n.centroid, i.centroid) AS centroid
  FROM cinit i LEFT JOIN cnew n ON n.cell = i.cell
),
cassigned AS (
  SELECT cid, cell FROM (
    SELECT v.vec_id AS cid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_dot_product(v.e, c.centroid), 6) DESC,
                                       c.cell) AS r
    FROM v CROSS JOIN cents c
  ) WHERE r = 1
),
rx AS (
  SELECT a.cid, a.cell, t.i AS pos, v.e[t.i] - c.centroid[t.i] AS val
  FROM cassigned a JOIN v ON v.vec_id = a.cid
       JOIN cents c ON c.cell = a.cell,
       UNNEST(generate_series(1, 64)) t(i)
),
rv AS (SELECT cid, cell, list(val ORDER BY pos) AS rvec FROM rx GROUP BY cid, cell),
subs AS (
  SELECT cid, t.s AS sub, list_slice(rvec, t.s * 16 + 1, t.s * 16 + 16) AS svec
  FROM rv, UNNEST(generate_series(0, 3)) t(s)
),"""
    + _PQ_FROM_SUBS
    + """,
probed AS (
  SELECT qid, cell FROM (
    SELECT v.vec_id AS qid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_dot_product(v.e, c.centroid), 6) DESC,
                                       c.cell) AS r
    FROM v CROSS JOIN cents c
    WHERE v.vec_id < 8
  ) WHERE r <= 2
),
coarse AS (
  SELECT p.qid, p.cell,
         CAST(ROUND(list_dot_product(qv.e, c.centroid) * 1000000.0, 0) AS BIGINT)
           AS coarse_units
  FROM probed p JOIN cents c ON c.cell = p.cell
       JOIN v qv ON qv.vec_id = p.qid
),
qsubs AS (
  SELECT vec_id AS qid, t.s AS sub,
         list_slice(e, t.s * 16 + 1, t.s * 16 + 16) AS svec
  FROM v, UNNEST(generate_series(0, 3)) t(s)
  WHERE vec_id < 8
),
lut AS (
  SELECT q.qid, q.sub, c.code,
         CAST(ROUND(list_dot_product(q.svec, c.centroid) * 1000000.0, 0) AS BIGINT)
           AS part_units
  FROM qsubs q JOIN cb c ON c.sub = q.sub
),
cand AS (
  SELECT co.qid, f.cid, co.coarse_units, l.part_units
  FROM enc f
       JOIN rv ON rv.cid = f.cid
       JOIN coarse co ON co.cell = rv.cell
       JOIN lut l ON l.qid = co.qid AND l.sub = f.sub AND l.code = f.code
  WHERE f.cid != co.qid
),
scored AS (
  SELECT qid, cid, MIN(coarse_units) + SUM(part_units) AS adc_units
  FROM cand GROUP BY qid, cid
),
ranked AS (
  SELECT qid, cid, adc_units,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_units DESC, cid) AS rank
  FROM scored
)
SELECT qid, cid,
       ROUND(CAST(adc_units AS DOUBLE) / 1000000.0, 6) AS adc_score,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY qid, rank
"""
)


def q_emb_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (operators/kmeans.py): 2 iterations
    from md5-order seeds, k=8, every quantity exact INT64 — quantized
    coords floor(x*1e6), integer squared distances, centroid updates
    round-half-away(sum/count) on the same 1e-6 grid — so the oracle
    replays the ENTIRE iteration history in SQL (seeds, 2 assignment
    rounds, 2 centroid updates, final assignment) and the two engines
    agree bit-for-bit. Spark shape: broadcast k x d centroids,
    map-only assignment, map-side-combined (cluster, dim) update
    partials; the only driver traffic is the k x d centroid table per
    iteration (the Spark MLlib KMeans shape)."""
    from easydb_server_spark.operators.kmeans import kmeans_assign

    e = load(spark, sf_dir, "embeddings")
    out = kmeans_assign(e, "embedding", "vec_id", k=8, iters=2)
    return out.select(
        F.col("pid").alias("vec_id"), "cluster", "dist2"
    ).orderBy("vec_id")


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled-CTE DuckDB replay of q_emb_kmeans_assign: c0 from the
    md5-order seeds, then per iteration an assignment (argmin integer
    distance, ties to the smaller cluster) and a centroid update
    (round-half-away(sum/count), empty clusters coalesce to the
    previous centroid), then the final assignment over c{iters}."""
    parts = [
        """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
x AS (
  SELECT vec_id, u.i - 1 AS d,
         CAST(floor(e[u.i] * 1000000.0) AS BIGINT) AS q
  FROM v, UNNEST(generate_series(1, len(e))) u(i)
),
s AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cluster
  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT %d
),
c0 AS (SELECT s.cluster, x.d, x.q AS cq FROM s JOIN x USING (vec_id))"""
        % k
    ]
    assign_tpl = """{name} AS (
  SELECT vec_id, cluster, dist2 FROM (
    SELECT x.vec_id, c.cluster,
           SUM((x.q - c.cq) * (x.q - c.cq)) AS dist2,
           row_number() OVER (
             PARTITION BY x.vec_id
             ORDER BY SUM((x.q - c.cq) * (x.q - c.cq)), c.cluster
           ) AS rn
    FROM x JOIN {cents} c ON x.d = c.d
    GROUP BY x.vec_id, c.cluster
  ) WHERE rn = 1
)"""
    for t in range(1, iters + 1):
        parts.append(assign_tpl.format(name=f"a{t}", cents=f"c{t - 1}"))
        parts.append(
            f"""u{t} AS (
  SELECT a.cluster, x.d, CAST(SUM(x.q) AS BIGINT) AS s, COUNT(*) AS n
  FROM a{t} a JOIN x USING (vec_id)
  GROUP BY a.cluster, x.d
),
c{t} AS (
  SELECT c.cluster, c.d,
         COALESCE(
           CAST((CASE WHEN u.s < 0 THEN -1 ELSE 1 END) *
                ((abs(u.s) // u.n) +
                 (CASE WHEN 2 * (abs(u.s) % u.n) >= u.n THEN 1 ELSE 0 END))
                AS BIGINT),
           c.cq) AS cq
  FROM c{t - 1} c LEFT JOIN u{t} u ON c.cluster = u.cluster AND c.d = u.d
)"""
        )
    parts.append(assign_tpl.format(name="afinal", cents=f"c{iters}"))
    return (
        ",\n".join(parts)
        + """
SELECT vec_id, CAST(cluster AS INT) AS cluster, CAST(dist2 AS BIGINT) AS dist2
FROM afinal ORDER BY vec_id"""
    )


ORACLE_EMB_KMEANS_ASSIGN = _kmeans_oracle(8, 2)


def q_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup (operators/text.py canonical_url /
    dedup_url_canonical) over deterministically synthesized messy
    variants: doc_id % 50 picks the logical page, doc_id % 6 the mess
    applied to its URL — uppercased scheme+host+www, an explicit
    default :443 port, a trailing slash plus utm_* params, a fragment,
    and the same two real params in both orders. Variants 0-3
    canonicalize to the bare page URL and 4-5 to its ?a=1&b=2 twin;
    the keeper is the longest doc (ties to the smaller doc_id). The
    oracle replays the URL construction AND every canonicalization
    rule in SQL."""
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    site = (F.col("doc_id") % 50 % 5).cast("string")
    page = (F.col("doc_id") % 50).cast("string")
    path = F.concat(F.lit("/articles/page"), page)
    m = F.col("doc_id") % 6
    url = (
        F.when(m == 0, F.concat(F.lit("HTTPS://WWW.SITE"), site, F.lit(".COM"), path))
        .when(m == 1, F.concat(F.lit("https://site"), site, F.lit(".com:443"), path))
        .when(
            m == 2,
            F.concat(
                F.lit("https://site"), site, F.lit(".com"), path,
                F.lit("/?utm_source=feed&utm_campaign=x"),
            ),
        )
        .when(
            m == 3,
            F.concat(F.lit("https://www.site"), site, F.lit(".com"), path, F.lit("#section-2")),
        )
        .when(m == 4, F.concat(F.lit("https://site"), site, F.lit(".com"), path, F.lit("?b=2&a=1")))
        .otherwise(
            F.concat(
                F.lit("https://site"), site, F.lit(".com"), path, F.lit("?a=1&b=2&utm_medium=email")
            )
        )
    )
    built = d.select("doc_id", "n_chars", url.alias("url"))
    return T.dedup_url_canonical(built, "url", "doc_id", "n_chars").orderBy("canonical_url")


ORACLE_DEDUP_URL_CANONICAL = """
WITH built AS (
  SELECT doc_id, n_chars,
         CASE doc_id % 6
           WHEN 0 THEN 'HTTPS://WWW.SITE' || CAST(doc_id % 50 % 5 AS VARCHAR) || '.COM/articles/page' || CAST(doc_id % 50 AS VARCHAR)
           WHEN 1 THEN 'https://site' || CAST(doc_id % 50 % 5 AS VARCHAR) || '.com:443/articles/page' || CAST(doc_id % 50 AS VARCHAR)
           WHEN 2 THEN 'https://site' || CAST(doc_id % 50 % 5 AS VARCHAR) || '.com/articles/page' || CAST(doc_id % 50 AS VARCHAR) || '/?utm_source=feed&utm_campaign=x'
           WHEN 3 THEN 'https://www.site' || CAST(doc_id % 50 % 5 AS VARCHAR) || '.com/articles/page' || CAST(doc_id % 50 AS VARCHAR) || '#section-2'
           WHEN 4 THEN 'https://site' || CAST(doc_id % 50 % 5 AS VARCHAR) || '.com/articles/page' || CAST(doc_id % 50 AS VARCHAR) || '?b=2&a=1'
           ELSE 'https://site' || CAST(doc_id % 50 % 5 AS VARCHAR) || '.com/articles/page' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&b=2&utm_medium=email'
         END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, n_chars,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
         regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM built
),
canon AS (
  SELECT doc_id, n_chars,
         scheme || '://' ||
         regexp_replace(regexp_extract(hostport, '^([^:]+)', 1), '^www\\.', '') ||
         CASE
           WHEN regexp_extract(hostport, ':([0-9]+)$', 1) = '' THEN ''
           WHEN scheme = 'http'  AND regexp_extract(hostport, ':([0-9]+)$', 1) = '80'  THEN ''
           WHEN scheme = 'https' AND regexp_extract(hostport, ':([0-9]+)$', 1) = '443' THEN ''
           ELSE ':' || regexp_extract(hostport, ':([0-9]+)$', 1)
         END ||
         path ||
         CASE
           WHEN len(list_filter(str_split(query, '&'),
                    p -> p <> '' AND NOT regexp_matches(lower(p), '^(utm_[a-z0-9_]*=|fbclid=|gclid=|ref=)'))) = 0
           THEN ''
           ELSE '?' || array_to_string(
                  list_sort(list_filter(str_split(query, '&'),
                    p -> p <> '' AND NOT regexp_matches(lower(p), '^(utm_[a-z0-9_]*=|fbclid=|gclid=|ref=)'))),
                  '&')
         END AS canonical_url
  FROM parts
)
SELECT canonical_url, keep_id, keep_quality, n_variants FROM (
  SELECT canonical_url, doc_id AS keep_id, CAST(n_chars AS BIGINT) AS keep_quality,
         row_number() OVER (PARTITION BY canonical_url ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY canonical_url) AS n_variants
  FROM canon
) WHERE rn = 1
ORDER BY canonical_url
"""


def q_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (operators/pq.py:ivfpq_rerank): the IVFADC
    entry's identical index (m=4, k=8, 8 cells, nprobe=2) proposes 32
    candidates per query, whose RAW vectors are then exactly re-ranked
    by inner product — the serving composition that buys back ADC's
    quantization error on a bounded slice. The oracle reuses the full
    IVFADC derivation chain verbatim and replays stage 2 as two joins
    plus a window."""
    from easydb_server_spark.operators.pq import ivfpq_rerank

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8)
    return ivfpq_rerank(
        e, q, "embedding", "vec_id",
        m=4, k=8, n_cells=8, nprobe=2, k_candidates=32, k_top=5,
    ).orderBy("qid", "rank")


_IVFPQ_FINAL_SELECT = """SELECT qid, cid,
       ROUND(CAST(adc_units AS DOUBLE) / 1000000.0, 6) AS adc_score,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY qid, rank"""

assert _IVFPQ_FINAL_SELECT in ORACLE_IVFPQ_ADC_TOPK, "IVFADC oracle tail drifted"

ORACLE_IVFPQ_RERANK = ORACLE_IVFPQ_ADC_TOPK.replace(
    _IVFPQ_FINAL_SELECT,
    """, rr AS (
  SELECT r.qid, r.cid,
         CAST(ROUND(list_dot_product(q.e, c.e) * 1000000.0, 0) AS BIGINT)
           AS exact_units,
         r.rank AS adc_rank
  FROM ranked r
       JOIN v q ON q.vec_id = r.qid
       JOIN v c ON c.vec_id = r.cid
  WHERE r.rank <= 32
),
rr2 AS (
  SELECT qid, cid, exact_units, adc_rank,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY exact_units DESC, cid) AS rank
  FROM rr
)
SELECT qid, cid,
       ROUND(CAST(exact_units AS DOUBLE) / 1000000.0, 6) AS exact_score,
       CAST(adc_rank AS INT) AS adc_rank,
       CAST(rank AS INT) AS rank
FROM rr2 WHERE rank <= 5
ORDER BY qid, rank""",
)


# ---------- image perceptual-hash near-dup dedup (operators/imagehash.py) ----------


def _image_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> dHash signature of a deterministic GIF blob with
    PLANTED near-dup groups, built and hashed inside ONE Arrow stage
    (r16, guide §4: image_dhash_row IS the image_dhash body — the
    encode → decode codec round-trip is intact but the blobs never
    cross the JVM↔Python boundary).

    Each doc_id < 400 renders a palettized image whose content depends
    only on ``base = doc_id % 40`` — so every base group's ~10 members
    are near-identical — except that odd doc_ids get ONE source pixel
    (0, 0) recolored (+8 palette steps). Geometry (w = 12 + base%5,
    h = 10 + base%4) exceeds the 9x8 dHash grid, so sampling is
    injective and the single-pixel edit can flip at most dHash bit 0:
    within a base group, hamming(even, even) = 0 and
    hamming(even, odd) <= 1 — real near-dups, not byte dups. Encoded
    to genuine GIF89a/LZW bytes (operators/gif.py) so the hash path
    exercises the REAL codec; the oracle replays the palette/sampling
    arithmetic in closed form and never sees bytes."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 400).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif
        from easydb_server_spark.operators.imagehash import image_dhash_row

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                base = did % 40
                w, h = 12 + base % 5, 10 + base % 4
                y, x = np.mgrid[0:h, 0:w]
                idx = (base * 3 + y * 5 + x * 7) % 16
                if did % 2 == 1:
                    idx[0, 0] = (idx[0, 0] + 8) % 16
                out.append(image_dhash_row(did, encode_gif(pal[idx])))
            yield pd.DataFrame(
                out,
                columns=["item_id", "band0", "band1", "band2", "band3", "phash"],
            )

    from easydb_server_spark.operators.imagehash import DHASH_SCHEMA

    return d.mapInPandas(build, DHASH_SCHEMA)


# Closed-form replay of the sampled-pixel dHash: only the 9x8 SAMPLED
# grid positions matter (nearest-neighbor point sampling), so the
# oracle evaluates the palette recipe at sx=(u*w)//9, sy=(v*h)//8 and
# never materializes whole images.
_IMG_SIG_CTES = """
imgdocs AS (
  SELECT doc_id, doc_id % 40 AS base, doc_id % 2 AS var,
         12 + (doc_id % 40) % 5 AS w, 10 + (doc_id % 40) % 4 AS h
  FROM documents WHERE doc_id < 400
),
samp AS (
  SELECT d.doc_id, vv.v, uu.u,
         (uu.u * d.w) // 9 AS sx, (vv.v * d.h) // 8 AS sy, d.base, d.var
  FROM imgdocs d,
       UNNEST(generate_series(0, 7)) vv(v),
       UNNEST(generate_series(0, 8)) uu(u)
),
gry AS (
  SELECT doc_id, v, u,
         (299 * ((idx * 16) % 256) + 587 * ((idx * 37) % 256)
          + 114 * ((idx * 73) % 256)) // 1000 AS gr
  FROM (
    SELECT doc_id, v, u,
           (base * 3 + sy * 5 + sx * 7
            + CASE WHEN var = 1 AND sy = 0 AND sx = 0 THEN 8 ELSE 0 END) % 16 AS idx
    FROM samp
  )
),
dbits AS (
  SELECT l.doc_id, l.v * 8 + l.u AS i,
         CASE WHEN l.gr < r.gr THEN 1 ELSE 0 END AS bit
  FROM gry l JOIN gry r ON r.doc_id = l.doc_id AND r.v = l.v AND r.u = l.u + 1
  WHERE l.u < 8
),
bnd AS (
  SELECT doc_id, i // 16 AS b,
         CAST(SUM(CAST(bit AS BIGINT) << (i % 16)) AS BIGINT) AS bv
  FROM dbits GROUP BY doc_id, i // 16
),
sig AS (
  SELECT doc_id AS item_id,
         MAX(CASE WHEN b = 0 THEN bv END) AS band0,
         MAX(CASE WHEN b = 1 THEN bv END) AS band1,
         MAX(CASE WHEN b = 2 THEN bv END) AS band2,
         MAX(CASE WHEN b = 3 THEN bv END) AS band3
  FROM bnd GROUP BY doc_id
)
"""


def q_dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image dHash signatures through the REAL GIF codec: encode
    the deterministic fixture images to genuine GIF89a bytes, decode
    them back, grayscale + 9x8 nearest-neighbor sample + gradient
    bits — all inside ONE Arrow-batched decoder stage
    (operators/imagehash.py image_dhash). A hash match against the
    closed-form pixel-arithmetic oracle proves the full
    encode->decode->grayscale->sample->bit path is bit-exact."""
    return _image_sigs(spark, sf_dir).orderBy("item_id")


ORACLE_DEDUP_IMAGE_PHASH = f"""
WITH {_IMG_SIG_CTES}
SELECT item_id, band0, band1, band2, band3,
       printf('%04x%04x%04x%04x', band3, band2, band1, band0) AS phash
FROM sig ORDER BY item_id
"""


def q_dedup_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup resolution end to end: dHash signatures ->
    banded Hamming LSH candidate pairs (4x16-bit bands, pigeonhole-
    complete at max_hamming=3, NEVER all-pairs) -> XOR-popcount
    verification -> connected components (operators/clusters.py) ->
    min-id keeper per cluster. Output: every fixture image with its
    cluster label and whether it is the cluster's keeper."""
    from easydb_server_spark.operators.clusters import connected_components
    from easydb_server_spark.operators.imagehash import dhash_pairs

    # materialize the tiny signature table ONCE (localCheckpoint, same
    # device connected_components uses): the banded self-join reads
    # sigs on BOTH sides and the CC edge union reads pairs twice more,
    # so without this the Arrow codec stage (encode+decode every
    # image) re-executes ~4x per run — measured 4.64 s -> the codec
    # cost once. At 100 TB the same rule holds: persist signatures
    # (k bytes/image) before any self-join; never re-decode blobs.
    sigs = _image_sigs(spark, sf_dir).localCheckpoint(eager=True)
    pairs = dhash_pairs(sigs, max_hamming=3).select(
        F.col("item_a").alias("doc_a"), F.col("item_b").alias("doc_b")
    )
    cc = connected_components(pairs)
    base = load(spark, sf_dir, "documents").where(F.col("doc_id") < 400).select("doc_id")
    return (
        base.join(cc, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("component"))
        .withColumn("is_keeper", F.col("doc_id") == F.col("component"))
        .orderBy("doc_id")
    )


ORACLE_DEDUP_IMAGE_NEARDUP = f"""
WITH RECURSIVE {_IMG_SIG_CTES},
imgband AS (
  SELECT item_id, band0, band1, band2, band3, b.b,
         CASE b.b WHEN 0 THEN band0 WHEN 1 THEN band1
                  WHEN 2 THEN band2 ELSE band3 END AS bv
  FROM sig CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS b) b
),
cand AS (
  SELECT DISTINCT x.item_id AS doc_a, y.item_id AS doc_b,
         x.band0 AS a0, x.band1 AS a1, x.band2 AS a2, x.band3 AS a3,
         y.band0 AS b0, y.band1 AS b1, y.band2 AS b2, y.band3 AS b3
  FROM imgband x JOIN imgband y ON x.b = y.b AND x.bv = y.bv
  WHERE x.item_id < y.item_id
),
ipairs AS (
  SELECT doc_a, doc_b FROM cand
  WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
        + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) <= 3
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ipairs
  UNION SELECT doc_b, doc_a FROM ipairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
)
SELECT d.doc_id,
       COALESCE(l.component, d.doc_id) AS component,
       COALESCE(l.component, d.doc_id) = d.doc_id AS is_keeper
FROM (SELECT doc_id FROM documents WHERE doc_id < 400) d
LEFT JOIN labels l ON l.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection end-to-end through the REAL animated
    GIF codec: each doc_id < 300 becomes a T-frame animation
    (T = 6 + doc_id%4) built in scenes of 3 — within a scene,
    consecutive frames differ by ONE source pixel (a (0,0) palette
    jitter of f%3 steps: hamming <= 1 by the same injective-sampling
    argument as the dedup_image_phash fixture); at a scene boundary
    the whole palette recipe shifts (s*6), scrambling the gradient
    bits. frame_dhash decodes + composites every frame and hashes it
    in one Arrow-batched stage; scene_cuts lags the signatures over
    ONE keyed window and thresholds the XOR popcount. The oracle
    replays the per-frame sampled-pixel arithmetic and the f-1
    self-join in closed form — both engines flag the SAME frames,
    whatever hamming each boundary happens to produce."""
    import pandas as pd

    from easydb_server_spark.operators.imagehash import (
        FRAME_DHASH_SCHEMA,
        scene_cuts,
    )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif_animated
        from easydb_server_spark.operators.imagehash import frame_dhash_rows

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h, t = 12 + did % 5, 10 + did % 4, 6 + did % 4
                y, x = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(t):
                    idx = (did * 3 + (f // 3) * 6 + y * 5 + x * 7) % 16
                    idx[0, 0] = (idx[0, 0] + f % 3) % 16
                    frames.append(pal[idx])
                # r16 (guide §4): hash right here — the encode →
                # decode codec round-trip stays inside this one Arrow
                # stage (frame_dhash_rows IS the operator body), and
                # the GIF blobs never cross the JVM↔Python boundary
                out.extend(frame_dhash_rows(did, encode_gif_animated(frames)))
            yield pd.DataFrame(
                out,
                columns=["item_id", "frame_idx", "band0", "band1", "band2", "band3"],
            )

    sigs = spread(d).mapInPandas(build, FRAME_DHASH_SCHEMA)
    return scene_cuts(sigs, max_hamming=3).orderBy("item_id", "frame_idx")


# Shared closed-form replay of the per-frame sampled-pixel dHash
# (video_scene_cuts + video_keyframes): the 9x8 sampled grid only.
_VIDEO_SIG_CTES = """
vdocs AS (
  SELECT doc_id, 12 + doc_id % 5 AS w, 10 + doc_id % 4 AS h,
         6 + doc_id % 4 AS t
  FROM documents WHERE doc_id < 300
),
vframes AS (
  SELECT d.doc_id, d.w, d.h, ff.f FROM vdocs d,
         UNNEST(generate_series(0, d.t - 1)) ff(f)
),
vsamp AS (
  SELECT fr.doc_id, fr.f, vv.v, uu.u,
         (uu.u * fr.w) // 9 AS sx, (vv.v * fr.h) // 8 AS sy
  FROM vframes fr,
       UNNEST(generate_series(0, 7)) vv(v),
       UNNEST(generate_series(0, 8)) uu(u)
),
vgry AS (
  SELECT doc_id, f, v, u,
         (299 * ((idx * 16) % 256) + 587 * ((idx * 37) % 256)
          + 114 * ((idx * 73) % 256)) // 1000 AS gr
  FROM (
    SELECT doc_id, f, v, u,
           ((doc_id * 3 + (f // 3) * 6 + sy * 5 + sx * 7) % 16
            + CASE WHEN sy = 0 AND sx = 0 THEN f % 3 ELSE 0 END) % 16 AS idx
    FROM vsamp
  )
),
vbits AS (
  SELECT l.doc_id, l.f, l.v * 8 + l.u AS i,
         CASE WHEN l.gr < r.gr THEN 1 ELSE 0 END AS bit
  FROM vgry l JOIN vgry r ON r.doc_id = l.doc_id AND r.f = l.f
                         AND r.v = l.v AND r.u = l.u + 1
  WHERE l.u < 8
),
vbnd AS (
  SELECT doc_id, f, i // 16 AS b,
         CAST(SUM(CAST(bit AS BIGINT) << (i % 16)) AS BIGINT) AS bv
  FROM vbits GROUP BY doc_id, f, i // 16
),
vsig AS (
  SELECT doc_id, f,
         MAX(CASE WHEN b = 0 THEN bv END) AS band0,
         MAX(CASE WHEN b = 1 THEN bv END) AS band1,
         MAX(CASE WHEN b = 2 THEN bv END) AS band2,
         MAX(CASE WHEN b = 3 THEN bv END) AS band3
  FROM vbnd GROUP BY doc_id, f
)
"""

ORACLE_VIDEO_SCENE_CUTS = f"""
WITH {_VIDEO_SIG_CTES}
SELECT c.doc_id AS item_id, CAST(c.f AS INT) AS frame_idx,
       CAST(bit_count(xor(c.band0, p.band0)) + bit_count(xor(c.band1, p.band1))
            + bit_count(xor(c.band2, p.band2)) + bit_count(xor(c.band3, p.band3))
            AS INT) AS hamming_prev,
       (p.band0 IS NULL
        OR bit_count(xor(c.band0, p.band0)) + bit_count(xor(c.band1, p.band1))
           + bit_count(xor(c.band2, p.band2)) + bit_count(xor(c.band3, p.band3)) > 3)
         AS is_scene_start
FROM vsig c LEFT JOIN vsig p ON p.doc_id = c.doc_id AND p.f = c.f - 1
ORDER BY item_id, frame_idx
"""


def q_dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup grouping end-to-end through the REAL WAV codec
    (operators/audiofp.py): each doc_id < 400 becomes a 4-segment
    clip of frame-aligned pure tones — segment k carries bin
    b_k = 1 + ((doc_id%30)*7 + k*11) % 30 of the 64-point frame — at a
    doc-VARYING amplitude (8000 + (doc_id%5)*3000), so clips sharing
    ``base = doc_id % 30`` are true near-dups (same recording, ~13
    different gains) with DIFFERENT bytes. frame=hop=64 makes each
    STFT frame exactly one segment; a Hann-windowed bin-exact tone
    dominates its own bin 2x over the sidelobes, so every peak — and
    the md5 fingerprint — is closed-form. The oracle replays the bin
    arithmetic, the dash-joined sequence, its md5, and the keyed
    dup-group window; a hash match proves encode -> decode -> STFT ->
    argmax -> digest is exact AND gain-invariant."""
    import pandas as pd

    from easydb_server_spark.operators.audiofp import fingerprint_dup_groups

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 400).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.audiofp import (
            audio_fingerprint_row,
        )
        from easydb_server_spark.operators.wav import encode_wav

        j = np.arange(64, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                base, amp = did % 30, float(8000 + (did % 5) * 3000)
                segs = [
                    np.round(
                        amp * np.sin(2.0 * np.pi * (1 + (base * 7 + k * 11) % 30) * j / 64.0)
                    )
                    for k in range(4)
                ]
                s = np.concatenate(segs).astype(np.int16)
                # r16 (guide §4): fingerprint right here — the encode
                # → decode codec round-trip stays inside this one
                # Arrow stage (audio_fingerprint_row IS the operator
                # body), and the WAV blobs never cross the JVM↔Python
                # boundary
                out.append(audio_fingerprint_row(did, encode_wav(s, 8000), 64, 64))
            yield pd.DataFrame(
                out, columns=["item_id", "n_frames", "peak_seq", "fp"]
            )

    sigs = d.mapInPandas(
        build, "item_id bigint, n_frames int, peak_seq string, fp string"
    )
    return fingerprint_dup_groups(sigs).orderBy("item_id")


ORACLE_DEDUP_AUDIO_FINGERPRINT = """
WITH adocs AS (
  SELECT doc_id, doc_id % 30 AS base FROM documents WHERE doc_id < 400
),
seq AS (
  SELECT doc_id,
         concat_ws('-',
           CAST(1 + (base * 7) % 30 AS VARCHAR),
           CAST(1 + (base * 7 + 11) % 30 AS VARCHAR),
           CAST(1 + (base * 7 + 22) % 30 AS VARCHAR),
           CAST(1 + (base * 7 + 33) % 30 AS VARCHAR)) AS peak_seq
  FROM adocs
),
sig AS (SELECT doc_id, peak_seq, md5(peak_seq) AS fp FROM seq)
SELECT doc_id AS item_id,
       CAST(4 AS INT) AS n_frames,
       fp,
       CAST(COUNT(*) OVER (PARTITION BY fp) AS INT) AS group_size,
       doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS is_canonical
FROM sig
ORDER BY item_id
"""


def q_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe extraction end-to-end: the SAME animated fixture as
    video_scene_cuts, but through the fused zero-shuffle operator
    (operators/imagehash.keyframes) — per item, decode + hash +
    scene-detect + featurize entirely in-row inside one Arrow stage,
    emitting ONE representative frame per perceptual scene with its
    dims and channel means. The oracle replays scene detection on the
    9x8 sampled grid and the channel means over the FULL pixel grid
    in closed form; a hash match proves the fused path agrees with
    the windowed scene_cuts semantics AND the codec's pixel
    fidelity."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id")

    # r16 (guide §4): build + keyframe extraction fused in ONE Arrow
    # stage (keyframe_rows IS the keyframes operator body — same
    # encode → decode codec round-trip, same scene/mean arithmetic);
    # the animated blobs never cross the JVM↔Python boundary.
    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif_animated
        from easydb_server_spark.operators.imagehash import keyframe_rows

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        out_cols = [
            "item_id", "frame_idx", "scene_idx", "width", "height",
            "mean_r_q4", "mean_g_q4", "mean_b_q4",
        ]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h, t = 12 + did % 5, 10 + did % 4, 6 + did % 4
                y, x = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(t):
                    idx = (did * 3 + (f // 3) * 6 + y * 5 + x * 7) % 16
                    idx[0, 0] = (idx[0, 0] + f % 3) % 16
                    frames.append(pal[idx])
                out.extend(
                    keyframe_rows(did, encode_gif_animated(frames), max_hamming=3)
                )
            yield pd.DataFrame(out, columns=out_cols)

    from easydb_server_spark.operators.imagehash import KEYFRAME_SCHEMA

    return spread(d).mapInPandas(build, KEYFRAME_SCHEMA).orderBy(
        "item_id", "frame_idx"
    )


ORACLE_VIDEO_KEYFRAMES = f"""
WITH {_VIDEO_SIG_CTES},
ham AS (
  SELECT c.doc_id, c.f,
         (p.band0 IS NULL
          OR bit_count(xor(c.band0, p.band0)) + bit_count(xor(c.band1, p.band1))
             + bit_count(xor(c.band2, p.band2)) + bit_count(xor(c.band3, p.band3)) > 3)
           AS is_start
  FROM vsig c LEFT JOIN vsig p ON p.doc_id = c.doc_id AND p.f = c.f - 1
),
keyf AS (
  SELECT doc_id, f,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS scene_idx
  FROM ham WHERE is_start
),
fullpx AS (
  SELECT k.doc_id, k.f, k.scene_idx, d.w, d.h,
         ((d.doc_id * 3 + (k.f // 3) * 6 + yy.y * 5 + xx.x * 7) % 16
          + CASE WHEN yy.y = 0 AND xx.x = 0 THEN k.f % 3 ELSE 0 END) % 16 AS i
  FROM keyf k
  JOIN vdocs d ON d.doc_id = k.doc_id,
       UNNEST(generate_series(0, d.h - 1)) yy(y),
       UNNEST(generate_series(0, d.w - 1)) xx(x)
)
SELECT doc_id                       AS item_id,
       CAST(f AS INT)               AS frame_idx,
       CAST(MAX(scene_idx) AS INT)  AS scene_idx,
       CAST(MAX(w) AS INT)          AS width,
       CAST(MAX(h) AS INT)          AS height,
       CAST(SUM((i * 16) % 256) * 10000 // COUNT(*) AS BIGINT) AS mean_r_q4,
       CAST(SUM((i * 37) % 256) * 10000 // COUNT(*) AS BIGINT) AS mean_g_q4,
       CAST(SUM((i * 73) % 256) * 10000 // COUNT(*) AS BIGINT) AS mean_b_q4
FROM fullpx GROUP BY doc_id, f
ORDER BY item_id, frame_idx
"""


def q_dedup_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip-level video near-dup dedup end-to-end (the r14 verdict's
    ask #3): each doc_id < 360 becomes a 6-frame animated GIF of 3
    two-frame scenes whose content depends on ``base = doc_id % 30``
    — so each base has 12 members: the 8 variants with vr%3 != 2
    share IDENTICAL scene content (re-encode dups: same recording,
    different bytes), while the 4 variants with vr%3 == 2 shift scene
    1's palette recipe (+9), a one-scene-differs near-dup. Within a
    scene the second frame jitters source pixel (0,0) by one palette
    step (hamming <= 1 — no false boundary); scene boundaries shift
    the whole recipe (s*6), scrambling the gradient bits.

    operators/imagehash.video_signature computes the ordered
    scene-start dHash sequence + md5 digest fused in ONE zero-shuffle
    Arrow stage; video_neardup_pairs groups by (n_scenes, chunk,
    chunk-digest) — digest/banded, NEVER all-pairs — and verifies
    positional mismatches <= 1 in-row; connected components label the
    near-dup clusters. Output: every clip with its scene count, exact
    digest, exact-dup group size, near-dup component, and keeper flag.
    The oracle replays scene detection on the 9x8 sampled grid, the
    dash-joined hex sequence + md5, the <=1-mismatch pair spec
    DIRECTLY (all-pairs over 360 clips — which also proves the banded
    candidates are pigeonhole-complete), and the reachability closure."""
    import pandas as pd
    from pyspark.sql import Window

    from easydb_server_spark.operators.clusters import connected_components
    from easydb_server_spark.operators.imagehash import video_neardup_pairs

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 360).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif_animated
        from easydb_server_spark.operators.imagehash import video_signature_row

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                base, vr = did % 30, did // 30
                w, h = 12 + base % 5, 10 + base % 4
                y, x = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(6):
                    s, j = f // 2, f % 2
                    shift9 = 9 if (s == 1 and vr % 3 == 2) else 0
                    idx = (base * 5 + s * 6 + shift9 + y * 5 + x * 7) % 16
                    idx[0, 0] = (idx[0, 0] + j) % 16
                    frames.append(pal[idx])
                # r16 (guide §4): sign right here — the encode →
                # decode codec round-trip runs inside this one Arrow
                # stage (video_signature_row IS the operator body),
                # and the GIF blobs never cross the JVM↔Python
                # boundary a second time
                out.append(video_signature_row(did, encode_gif_animated(frames)))
            yield pd.DataFrame(
                out, columns=["item_id", "n_scenes", "sig_seq", "sig"]
            )

    # persist the tiny signature table before any self-join (the
    # dedup_image_neardup rule): the banded join reads sigs on both
    # sides, the verify stage re-attaches sequences twice more, and
    # the final projection reads it again — without this the Arrow
    # codec stage re-decodes every clip per consumer.
    sigs = spread(d).mapInPandas(
        build, "item_id bigint, n_scenes int, sig_seq string, sig string"
    ).localCheckpoint(eager=True)
    pairs = video_neardup_pairs(sigs, max_diff=1).select(
        F.col("item_a").alias("doc_a"), F.col("item_b").alias("doc_b")
    )
    cc = connected_components(pairs).withColumnRenamed("doc_id", "item_id")
    w = Window.partitionBy("sig")
    return (
        sigs.join(cc, "item_id", "left")
        .select(
            "item_id",
            "n_scenes",
            "sig",
            F.count(F.lit(1)).over(w).cast("int").alias("exact_group_size"),
            F.coalesce(F.col("component"), F.col("item_id")).alias("component"),
        )
        .withColumn("is_keeper", F.col("item_id") == F.col("component"))
        .orderBy("item_id")
    )


ORACLE_DEDUP_VIDEO_NEARDUP = """
WITH RECURSIVE
nvdocs AS (
  SELECT doc_id, doc_id % 30 AS base, doc_id // 30 AS vr,
         12 + (doc_id % 30) % 5 AS w, 10 + (doc_id % 30) % 4 AS h
  FROM documents WHERE doc_id < 360
),
nvsamp AS (
  SELECT d.doc_id, d.base, d.vr, ff.f, vv.v, uu.u,
         (uu.u * d.w) // 9 AS sx, (vv.v * d.h) // 8 AS sy
  FROM nvdocs d,
       UNNEST(generate_series(0, 5)) ff(f),
       UNNEST(generate_series(0, 7)) vv(v),
       UNNEST(generate_series(0, 8)) uu(u)
),
nvgry AS (
  SELECT doc_id, f, v, u,
         (299 * ((idx * 16) % 256) + 587 * ((idx * 37) % 256)
          + 114 * ((idx * 73) % 256)) // 1000 AS gr
  FROM (
    SELECT doc_id, f, v, u,
           ((base * 5 + (f // 2) * 6
             + CASE WHEN f // 2 = 1 AND vr % 3 = 2 THEN 9 ELSE 0 END
             + sy * 5 + sx * 7) % 16
            + CASE WHEN sy = 0 AND sx = 0 THEN f % 2 ELSE 0 END) % 16 AS idx
    FROM nvsamp
  )
),
nvbits AS (
  SELECT l.doc_id, l.f, l.v * 8 + l.u AS i,
         CASE WHEN l.gr < r.gr THEN 1 ELSE 0 END AS bit
  FROM nvgry l JOIN nvgry r ON r.doc_id = l.doc_id AND r.f = l.f
                           AND r.v = l.v AND r.u = l.u + 1
  WHERE l.u < 8
),
nvbnd AS (
  SELECT doc_id, f, i // 16 AS b,
         CAST(SUM(CAST(bit AS BIGINT) << (i % 16)) AS BIGINT) AS bv
  FROM nvbits GROUP BY doc_id, f, i // 16
),
nvsig AS (
  SELECT doc_id, f,
         MAX(CASE WHEN b = 0 THEN bv END) AS band0,
         MAX(CASE WHEN b = 1 THEN bv END) AS band1,
         MAX(CASE WHEN b = 2 THEN bv END) AS band2,
         MAX(CASE WHEN b = 3 THEN bv END) AS band3
  FROM nvbnd GROUP BY doc_id, f
),
nvham AS (
  SELECT c.doc_id, c.f,
         printf('%04x%04x%04x%04x', c.band3, c.band2, c.band1, c.band0) AS ph,
         (p.band0 IS NULL
          OR bit_count(xor(c.band0, p.band0)) + bit_count(xor(c.band1, p.band1))
             + bit_count(xor(c.band2, p.band2)) + bit_count(xor(c.band3, p.band3)) > 3)
           AS is_start
  FROM nvsig c LEFT JOIN nvsig p ON p.doc_id = c.doc_id AND p.f = c.f - 1
),
nvs AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_scenes,
         string_agg(ph, '-' ORDER BY f) AS sig_seq,
         md5(string_agg(ph, '-' ORDER BY f)) AS sig
  FROM nvham WHERE is_start GROUP BY doc_id
),
nvpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM nvs a JOIN nvs b ON b.n_scenes = a.n_scenes AND a.doc_id < b.doc_id
  WHERE a.n_scenes > 1
    AND len(list_filter(generate_series(1, a.n_scenes),
        i -> string_split(a.sig_seq, '-')[i] <> string_split(b.sig_seq, '-')[i])) <= 1
),
nvedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM nvpairs
  UNION SELECT doc_b, doc_a FROM nvpairs
),
nvreach AS (
  SELECT src, dst FROM nvedges
  UNION
  SELECT r.src, e.dst FROM nvreach r JOIN nvedges e ON r.dst = e.src
),
nvlabels AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
  FROM nvreach GROUP BY src
)
SELECT s.doc_id AS item_id, s.n_scenes, s.sig,
       CAST(COUNT(*) OVER (PARTITION BY s.sig) AS INT) AS exact_group_size,
       COALESCE(l.component, s.doc_id) AS component,
       COALESCE(l.component, s.doc_id) = s.doc_id AS is_keeper
FROM nvs s LEFT JOIN nvlabels l ON l.doc_id = s.doc_id
ORDER BY item_id
"""


def q_dedup_audio_landmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHIFT-robust audio near-dup matching (the r14 verdict's ask
    #4): landmark/constellation pairs per Wang 2003 — the exact-
    sequence fingerprint (dedup_audio_fingerprint) catches re-encodes
    but NOT trimmed or padded copies, because any frame offset shifts
    the whole peak sequence; landmarks carry no absolute time, only
    (anchor peak, target peak, frame delta), so they survive whole-
    frame trims and pads.

    Fixture: doc_id < 400 are 4-segment clips of frame-aligned
    bin-exact tones, segment k at bin 1 + (base*7 + k*11 + base*k*5)
    % 31 with base = doc_id % 30 (the base*k cross term makes peak
    DELTAS base-dependent — a plain linear-in-k recipe gives every
    base the same delta and floods the corpus with colliding
    landmarks); doc_id in [400, 500) is a COPY of clip doc_id - 400
    at a different gain, padded with 1 + doc_id%3 silence frames and,
    for odd doc_id, trimmed to 3 segments. Every peak is closed-form
    (Hann-windowed bin-exact tone: center bin dominates 2x; silence
    frames argmax to bin 0), so the landmark sets replay exactly.

    Matching: distinct landmarks per clip (one keyed window + a
    2-column distinct), stop-landmark cap at 48 clips per landmark —
    load-bearing here: it drops the (0,0,delta) silence landmarks
    ~66 copies share, the Zipf head every real corpus has — then an
    equi-join on the landmark key (quadratic only inside surviving
    buckets) counting shared landmarks, threshold >= 3 (a trimmed
    copy shares exactly its 3 surviving tone landmarks with its
    source). 12 deterministic cross-base coincidences sit exactly at
    the threshold — the honest false-positive floor of landmark
    fingerprinting at min_shared=3, replayed identically by the
    oracle."""
    import pandas as pd

    from easydb_server_spark.operators.audiofp import (
        audio_landmarks,
        landmark_matches,
    )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.audiofp import (
            audio_fingerprint_row,
        )
        from easydb_server_spark.operators.wav import encode_wav

        j = np.arange(64, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                if did < 400:
                    base, off, nseg = did % 30, 0, 4
                else:
                    base = (did - 400) % 30
                    off = 1 + did % 3
                    nseg = 3 if did % 2 == 1 else 4
                amp = float(8000 + (did % 5) * 3000)
                segs = [np.zeros(64 * off, dtype=np.float64)] if off else []
                for k in range(nseg):
                    b = 1 + (base * 7 + k * 11 + base * k * 5) % 31
                    segs.append(np.round(amp * np.sin(2.0 * np.pi * b * j / 64.0)))
                s = np.concatenate(segs).astype(np.int16)
                # r16 (guide §4): fingerprint right here — the encode
                # → decode codec round-trip stays inside this one
                # Arrow stage (audio_fingerprint_row IS the operator
                # body), and the WAV blobs never cross the JVM↔Python
                # boundary
                out.append(audio_fingerprint_row(did, encode_wav(s, 8000), 64, 64))
            yield pd.DataFrame(
                out, columns=["item_id", "n_frames", "peak_seq", "fp"]
            )

    sigs = d.mapInPandas(
        build, "item_id bigint, n_frames int, peak_seq string, fp string"
    )
    # persist the landmark table before the self-join (the
    # dedup_image_neardup rule — never re-decode blobs per consumer)
    lms = audio_landmarks(sigs, fanout=3).localCheckpoint(eager=True)
    return landmark_matches(lms, min_shared=3, max_bucket=48).orderBy(
        "item_a", "item_b"
    )


ORACLE_DEDUP_AUDIO_LANDMARK = """
WITH aldocs AS (
  SELECT doc_id,
         CASE WHEN doc_id < 400 THEN doc_id % 30 ELSE (doc_id - 400) % 30 END AS base,
         CASE WHEN doc_id < 400 THEN 0 ELSE 1 + doc_id % 3 END AS off,
         CASE WHEN doc_id >= 400 AND doc_id % 2 = 1 THEN 3 ELSE 4 END AS nseg
  FROM documents WHERE doc_id < 500
),
alframes AS (
  SELECT d.doc_id, tt.t,
         CASE WHEN tt.t < d.off THEN 0
              ELSE 1 + (d.base * 7 + (tt.t - d.off) * 11
                        + d.base * (tt.t - d.off) * 5) % 31
         END AS p
  FROM aldocs d, UNNEST(generate_series(0, d.off + d.nseg - 1)) tt(t)
),
allm AS (
  SELECT DISTINCT a.doc_id, a.p * 1048576 + b.p * 1024 + (b.t - a.t) AS lm
  FROM alframes a JOIN alframes b
    ON b.doc_id = a.doc_id AND b.t - a.t BETWEEN 1 AND 3
),
alkeep AS (
  SELECT doc_id, lm FROM allm
  WHERE lm IN (SELECT lm FROM allm GROUP BY lm HAVING COUNT(*) <= 48)
)
SELECT x.doc_id AS item_a, y.doc_id AS item_b,
       CAST(COUNT(*) AS INT) AS shared
FROM alkeep x JOIN alkeep y ON y.lm = x.lm AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
HAVING COUNT(*) >= 3
ORDER BY item_a, item_b
"""


def q_audio_landmark_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio retrieval by landmark OFFSET VOTING (Wang 2003 §3 — the
    Shazam matcher, completing the landmark stack: extract ->
    pairwise match -> SEARCH): the 400 source clips are the INDEX,
    the 100 gain-shifted padded/trimmed copies are the QUERIES, and
    each shared timed landmark votes for its implied alignment
    offset = t_index - t_query. A true match concentrates votes on
    one offset (minus the pad amount); coincidental shared landmarks
    scatter. Same fixture arithmetic as dedup_audio_landmark, so
    every vote is closed-form: a padded 4-segment copy lands 6 votes
    on offset -pad, a trimmed 3-segment copy exactly 3 (= min_votes),
    and cross-base cells never reach 3 (simulated and
    oracle-replayed). The winner per query is pinned deterministic:
    votes DESC, then smallest (match_id, offset) — so among a base's
    ~13 identical index clips the smallest doc_id wins on both
    engines."""
    import pandas as pd

    from easydb_server_spark.operators.audiofp import (
        audio_landmarks_timed,
        landmark_search,
    )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.audiofp import (
            audio_fingerprint_row,
        )
        from easydb_server_spark.operators.wav import encode_wav

        j = np.arange(64, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                if did < 400:
                    base, off, nseg = did % 30, 0, 4
                else:
                    base = (did - 400) % 30
                    off = 1 + did % 3
                    nseg = 3 if did % 2 == 1 else 4
                amp = float(8000 + (did % 5) * 3000)
                segs = [np.zeros(64 * off, dtype=np.float64)] if off else []
                for k in range(nseg):
                    b = 1 + (base * 7 + k * 11 + base * k * 5) % 31
                    segs.append(np.round(amp * np.sin(2.0 * np.pi * b * j / 64.0)))
                s = np.concatenate(segs).astype(np.int16)
                # r16 (guide §4): fingerprint right here — the encode
                # → decode codec round-trip stays inside this one
                # Arrow stage (audio_fingerprint_row IS the operator
                # body), and the WAV blobs never cross the JVM↔Python
                # boundary
                out.append(audio_fingerprint_row(did, encode_wav(s, 8000), 64, 64))
            yield pd.DataFrame(
                out, columns=["item_id", "n_frames", "peak_seq", "fp"]
            )

    sigs = d.mapInPandas(
        build, "item_id bigint, n_frames int, peak_seq string, fp string"
    )
    # persist once; both the index and the query side slice from it
    lms = audio_landmarks_timed(sigs, fanout=3).localCheckpoint(eager=True)
    return landmark_search(
        lms.where(F.col("item_id") < 400),
        lms.where(F.col("item_id") >= 400),
        min_votes=3,
        max_bucket=48,
    ).orderBy("query_id")


ORACLE_AUDIO_LANDMARK_SEARCH = """
WITH aldocs AS (
  SELECT doc_id,
         CASE WHEN doc_id < 400 THEN doc_id % 30 ELSE (doc_id - 400) % 30 END AS base,
         CASE WHEN doc_id < 400 THEN 0 ELSE 1 + doc_id % 3 END AS off,
         CASE WHEN doc_id >= 400 AND doc_id % 2 = 1 THEN 3 ELSE 4 END AS nseg
  FROM documents WHERE doc_id < 500
),
alframes AS (
  SELECT d.doc_id, tt.t,
         CASE WHEN tt.t < d.off THEN 0
              ELSE 1 + (d.base * 7 + (tt.t - d.off) * 11
                        + d.base * (tt.t - d.off) * 5) % 31
         END AS p
  FROM aldocs d, UNNEST(generate_series(0, d.off + d.nseg - 1)) tt(t)
),
allmt AS (
  SELECT a.doc_id, a.t, a.p * 1048576 + b.p * 1024 + (b.t - a.t) AS lm
  FROM alframes a JOIN alframes b
    ON b.doc_id = a.doc_id AND b.t - a.t BETWEEN 1 AND 3
),
idx AS (SELECT doc_id, t, lm FROM allmt WHERE doc_id < 400),
idxkeep AS (
  SELECT doc_id, t, lm FROM idx
  WHERE lm IN (
    SELECT lm FROM (SELECT DISTINCT doc_id, lm FROM idx)
    GROUP BY lm HAVING COUNT(*) <= 48
  )
),
cells AS (
  SELECT q.doc_id AS query_id, x.doc_id AS match_id,
         CAST(x.t - q.t AS INT) AS "offset",
         CAST(COUNT(*) AS INT) AS votes
  FROM (SELECT doc_id, t, lm FROM allmt WHERE doc_id >= 400) q
  JOIN idxkeep x ON x.lm = q.lm
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 3
),
ranked AS (
  SELECT query_id, match_id, "offset", votes,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY votes DESC, match_id, "offset"
         ) AS rn
  FROM cells
)
SELECT query_id, match_id, "offset", votes FROM ranked WHERE rn = 1
ORDER BY query_id
"""


def q_video_landmark_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-robust VIDEO retrieval by scene-landmark offset voting —
    the video sibling of audio_landmark_search, and deliberately the
    SAME matcher (audiofp.landmark_search is modality-agnostic over
    (item_id, t, lm) rows; only the landmark extractor differs:
    imagehash.scene_landmarks hashes scene-token pairs). Covers the
    case video_neardup_pairs cannot: a clip with a PREPENDED promo
    scene has a different scene count, so positional matching never
    pairs it with its source — landmarks carry only inter-scene
    deltas and vote for the alignment.

    Fixture: the 360 near-dup clips are the INDEX; doc_id in
    [360, 440) are QUERIES — the base's 3 plain scenes with
    1 + doc_id%2 extra scenes PREPENDED (a distinct promo recipe).
    Every query shares exactly its 3 source scenes, landing the 3
    shared landmarks on offset -p: simulated 80/80 queries match
    their own base at exactly -p with votes == min_votes == 3, ties
    resolved to the base clip itself (smallest doc_id of the ~8
    identical plain members). The oracle replays frame arithmetic,
    scene detection, the md5 scene landmarks, vote cells, and the
    ROW_NUMBER tiebreak in closed form."""
    import pandas as pd

    from easydb_server_spark.operators.audiofp import landmark_search
    from easydb_server_spark.operators.imagehash import (
        scene_landmarks,
    )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 440).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif_animated
        from easydb_server_spark.operators.imagehash import (
            video_signature_row,
        )

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                if did < 360:
                    base, vr, p = did % 30, did // 30, 0
                else:
                    base, vr, p = (did - 360) % 30, 0, 1 + did % 2
                w, h = 12 + base % 5, 10 + base % 4
                y, x = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(2 * p):
                    sp, j = f // 2, f % 2
                    idx = (base * 5 + 7 + sp * 3 + y * 7 + x * 5) % 16
                    idx[0, 0] = (idx[0, 0] + j) % 16
                    frames.append(pal[idx])
                for f in range(6):
                    s, j = f // 2, f % 2
                    shift9 = 9 if (s == 1 and vr % 3 == 2) else 0
                    idx = (base * 5 + s * 6 + shift9 + y * 5 + x * 7) % 16
                    idx[0, 0] = (idx[0, 0] + j) % 16
                    frames.append(pal[idx])
                # r16 (guide §4): sign right here — the encode →
                # decode codec round-trip stays inside this one Arrow
                # stage (video_signature_row IS the operator body),
                # and the GIF blobs never cross the JVM↔Python
                # boundary
                out.append(video_signature_row(did, encode_gif_animated(frames)))
            yield pd.DataFrame(
                out, columns=["item_id", "n_scenes", "sig_seq", "sig"]
            )

    sigs = spread(d).mapInPandas(
        build, "item_id bigint, n_scenes int, sig_seq string, sig string"
    )
    # persist once; index and query sides both slice from it
    lms = scene_landmarks(sigs, fanout=3).localCheckpoint(eager=True)
    return landmark_search(
        lms.where(F.col("item_id") < 360),
        lms.where(F.col("item_id") >= 360),
        min_votes=3,
        max_bucket=None,
    ).orderBy("query_id")


ORACLE_VIDEO_LANDMARK_SEARCH = """
WITH vldocs AS (
  SELECT doc_id,
         CASE WHEN doc_id < 360 THEN doc_id % 30 ELSE (doc_id - 360) % 30 END AS base,
         CASE WHEN doc_id < 360 THEN doc_id // 30 ELSE 0 END AS vr,
         CASE WHEN doc_id < 360 THEN 0 ELSE 1 + doc_id % 2 END AS p
  FROM documents WHERE doc_id < 440
),
vlgeom AS (
  SELECT doc_id, base, vr, p,
         12 + base % 5 AS w, 10 + base % 4 AS h, 6 + 2 * p AS tcnt
  FROM vldocs
),
vlsamp AS (
  SELECT g.doc_id, g.base, g.vr, g.p, ff.f, vv.v, uu.u,
         (uu.u * g.w) // 9 AS sx, (vv.v * g.h) // 8 AS sy
  FROM vlgeom g,
       UNNEST(generate_series(0, g.tcnt - 1)) ff(f),
       UNNEST(generate_series(0, 7)) vv(v),
       UNNEST(generate_series(0, 8)) uu(u)
),
vlgry AS (
  SELECT doc_id, f, v, u,
         (299 * ((idx * 16) % 256) + 587 * ((idx * 37) % 256)
          + 114 * ((idx * 73) % 256)) // 1000 AS gr
  FROM (
    SELECT doc_id, f, v, u,
           (CASE WHEN f < 2 * p
                 THEN (base * 5 + 7 + (f // 2) * 3 + sy * 7 + sx * 5) % 16
                 ELSE (base * 5 + ((f - 2 * p) // 2) * 6
                       + CASE WHEN (f - 2 * p) // 2 = 1 AND vr % 3 = 2
                              THEN 9 ELSE 0 END
                       + sy * 5 + sx * 7) % 16
            END
            + CASE WHEN sy = 0 AND sx = 0 THEN f % 2 ELSE 0 END) % 16 AS idx
    FROM vlsamp
  )
),
vlbits AS (
  SELECT l.doc_id, l.f, l.v * 8 + l.u AS i,
         CASE WHEN l.gr < r.gr THEN 1 ELSE 0 END AS bit
  FROM vlgry l JOIN vlgry r ON r.doc_id = l.doc_id AND r.f = l.f
                           AND r.v = l.v AND r.u = l.u + 1
  WHERE l.u < 8
),
vlbnd AS (
  SELECT doc_id, f, i // 16 AS b,
         CAST(SUM(CAST(bit AS BIGINT) << (i % 16)) AS BIGINT) AS bv
  FROM vlbits GROUP BY doc_id, f, i // 16
),
vlsig AS (
  SELECT doc_id, f,
         MAX(CASE WHEN b = 0 THEN bv END) AS band0,
         MAX(CASE WHEN b = 1 THEN bv END) AS band1,
         MAX(CASE WHEN b = 2 THEN bv END) AS band2,
         MAX(CASE WHEN b = 3 THEN bv END) AS band3
  FROM vlbnd GROUP BY doc_id, f
),
vlham AS (
  SELECT c.doc_id, c.f,
         printf('%04x%04x%04x%04x', c.band3, c.band2, c.band1, c.band0) AS ph,
         (prev.band0 IS NULL
          OR bit_count(xor(c.band0, prev.band0)) + bit_count(xor(c.band1, prev.band1))
             + bit_count(xor(c.band2, prev.band2)) + bit_count(xor(c.band3, prev.band3)) > 3)
           AS is_start
  FROM vlsig c LEFT JOIN vlsig prev
    ON prev.doc_id = c.doc_id AND prev.f = c.f - 1
),
vltok AS (
  SELECT doc_id, ph,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) - 1 AS INT) AS t
  FROM vlham WHERE is_start
),
vllm AS (
  SELECT a.doc_id, a.t,
         md5(a.ph || ':' || b.ph || ':' || CAST(b.t - a.t AS VARCHAR)) AS lm
  FROM vltok a JOIN vltok b
    ON b.doc_id = a.doc_id AND b.t - a.t BETWEEN 1 AND 3
),
cells AS (
  SELECT q.doc_id AS query_id, x.doc_id AS match_id,
         CAST(x.t - q.t AS INT) AS "offset",
         CAST(COUNT(*) AS INT) AS votes
  FROM (SELECT doc_id, t, lm FROM vllm WHERE doc_id >= 360) q
  JOIN (SELECT doc_id, t, lm FROM vllm WHERE doc_id < 360) x ON x.lm = q.lm
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 3
),
ranked AS (
  SELECT query_id, match_id, "offset", votes,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY votes DESC, match_id, "offset"
         ) AS rn
  FROM cells
)
SELECT query_id, match_id, "offset", votes FROM ranked WHERE rn = 1
ORDER BY query_id
"""


def q_image_phash_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image retrieval by perceptual hash — the image slot of the
    per-modality search matrix (audio/video: landmark offset voting;
    embeddings: the sim_topk family). Index = the 400 dedup_image
    fixture images (base = doc_id % 40, odd ids carry the (0,0)+8
    single-pixel edit); queries (doc_id in [400, 480)) re-render the
    base recipe with a DIFFERENT single-pixel edit — (1,1)+4 palette
    steps, a position sampled by the 9x8 grid for every fixture
    geometry, so the edit flips at most the two gradient bits reading
    that cell. Every query's nearest index image within Hamming 3 is
    a member of its own base group (simulated 80/80, then
    oracle-replayed); banded candidates make missing it impossible
    (pigeonhole), and the (hamming, match_id) tiebreak is
    deterministic on both engines."""
    from easydb_server_spark.operators.imagehash import phash_search

    sigs = _phash_fixture_sigs(spark, sf_dir)
    return phash_search(
        sigs.where(F.col("item_id") < 400),
        sigs.where(F.col("item_id") >= 400),
        max_hamming=3,
    ).orderBy("query_id")


def _phash_fixture_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared image-retrieval fixture: dHash signatures of the 400
    dedup_image index images (base = doc_id % 40; odd ids carry the
    (0,0)+8 single-pixel edit) plus the 80 queries (doc_id in
    [400, 480), (1,1)+4 edit), persisted once so index and query sides
    slice from one table (the signatures-before-self-join rule)."""
    import pandas as pd

    from easydb_server_spark.operators.imagehash import DHASH_SCHEMA

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 480).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif
        from easydb_server_spark.operators.imagehash import image_dhash_row

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                base = did % 40 if did < 400 else (did - 400) % 40
                w, h = 12 + base % 5, 10 + base % 4
                y, x = np.mgrid[0:h, 0:w]
                idx = (base * 3 + y * 5 + x * 7) % 16
                if did < 400 and did % 2 == 1:
                    idx[0, 0] = (idx[0, 0] + 8) % 16
                elif did >= 400:
                    idx[1, 1] = (idx[1, 1] + 4) % 16
                # r16 (guide §4): hash right here — the encode →
                # decode codec round-trip stays inside this one Arrow
                # stage (image_dhash_row IS the operator body), and
                # the GIF blobs never cross the JVM↔Python boundary
                out.append(image_dhash_row(did, encode_gif(pal[idx])))
            yield pd.DataFrame(
                out,
                columns=["item_id", "band0", "band1", "band2", "band3", "phash"],
            )

    return d.mapInPandas(build, DHASH_SCHEMA).localCheckpoint(eager=True)


def q_image_phash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image retrieval generalized to top-k within radius (r15 verdict
    ask #7): the 3 nearest index images within Hamming 3 per query,
    over the same fixture as image_phash_search. Each query's base
    group holds 10 index members whose pairwise edits touch at most 4
    sampled-gradient bits, so ranks 1..3 land inside the group with
    the (hamming, match_id) tiebreak making the full ordering — not
    just the winner — deterministic on both engines. Plan shape is
    identical to top-1: the row_number window already computed every
    rank; only the filter widens."""
    from easydb_server_spark.operators.imagehash import phash_topk

    sigs = _phash_fixture_sigs(spark, sf_dir)
    return phash_topk(
        sigs.where(F.col("item_id") < 400),
        sigs.where(F.col("item_id") >= 400),
        k=3,
        max_hamming=3,
    ).orderBy("query_id", "rank")


ORACLE_IMAGE_PHASH_SEARCH = """
WITH isdocs AS (
  SELECT doc_id,
         CASE WHEN doc_id < 400 THEN doc_id % 40 ELSE (doc_id - 400) % 40 END AS base,
         CASE WHEN doc_id < 400 THEN doc_id % 2 ELSE 0 END AS var,
         CASE WHEN doc_id >= 400 THEN 1 ELSE 0 END AS isq
  FROM documents WHERE doc_id < 480
),
isgeom AS (
  SELECT doc_id, base, var, isq, 12 + base % 5 AS w, 10 + base % 4 AS h
  FROM isdocs
),
issamp AS (
  SELECT g.doc_id, g.base, g.var, g.isq, vv.v, uu.u,
         (uu.u * g.w) // 9 AS sx, (vv.v * g.h) // 8 AS sy
  FROM isgeom g,
       UNNEST(generate_series(0, 7)) vv(v),
       UNNEST(generate_series(0, 8)) uu(u)
),
isgry AS (
  SELECT doc_id, v, u,
         (299 * ((idx * 16) % 256) + 587 * ((idx * 37) % 256)
          + 114 * ((idx * 73) % 256)) // 1000 AS gr
  FROM (
    SELECT doc_id, v, u,
           ((base * 3 + sy * 5 + sx * 7) % 16
            + CASE WHEN isq = 0 AND var = 1 AND sy = 0 AND sx = 0 THEN 8
                   WHEN isq = 1 AND sy = 1 AND sx = 1 THEN 4
                   ELSE 0 END) % 16 AS idx
    FROM issamp
  )
),
isbits AS (
  SELECT l.doc_id, l.v * 8 + l.u AS i,
         CASE WHEN l.gr < r.gr THEN 1 ELSE 0 END AS bit
  FROM isgry l JOIN isgry r ON r.doc_id = l.doc_id AND r.v = l.v AND r.u = l.u + 1
  WHERE l.u < 8
),
isbnd AS (
  SELECT doc_id, i // 16 AS b,
         CAST(SUM(CAST(bit AS BIGINT) << (i % 16)) AS BIGINT) AS bv
  FROM isbits GROUP BY doc_id, i // 16
),
issig AS (
  SELECT doc_id,
         MAX(CASE WHEN b = 0 THEN bv END) AS band0,
         MAX(CASE WHEN b = 1 THEN bv END) AS band1,
         MAX(CASE WHEN b = 2 THEN bv END) AS band2,
         MAX(CASE WHEN b = 3 THEN bv END) AS band3
  FROM isbnd GROUP BY doc_id
),
isband AS (
  SELECT doc_id, b.b,
         CASE b.b WHEN 0 THEN band0 WHEN 1 THEN band1
                  WHEN 2 THEN band2 ELSE band3 END AS bv
  FROM issig CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS b) b
),
iscand AS (
  SELECT DISTINCT q.doc_id AS query_id, x.doc_id AS match_id
  FROM isband q JOIN isband x ON x.b = q.b AND x.bv = q.bv
  WHERE q.doc_id >= 400 AND x.doc_id < 400
),
isham AS (
  SELECT c.query_id, c.match_id,
         CAST(bit_count(xor(qs.band0, xs.band0)) + bit_count(xor(qs.band1, xs.band1))
              + bit_count(xor(qs.band2, xs.band2)) + bit_count(xor(qs.band3, xs.band3))
           AS INT) AS hamming
  FROM iscand c
  JOIN issig qs ON qs.doc_id = c.query_id
  JOIN issig xs ON xs.doc_id = c.match_id
),
isrank AS (
  SELECT query_id, match_id, hamming,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY hamming, match_id
         ) AS rn
  FROM isham WHERE hamming <= 3
)
SELECT query_id, match_id, hamming FROM isrank WHERE rn = 1
ORDER BY query_id
"""

# Same fixture, same CTE chain — only the final rank filter differs
# (rn <= 3 with the rank exposed), so the two specs cannot drift.
# "rank" is quoted: window-function keyword in DuckDB.
ORACLE_IMAGE_PHASH_TOPK = (
    ORACLE_IMAGE_PHASH_SEARCH.rsplit("SELECT query_id, match_id, hamming FROM isrank", 1)[0]
    + 'SELECT query_id, match_id, hamming, CAST(rn AS INT) AS "rank"\n'
    'FROM isrank WHERE rn <= 3\n'
    'ORDER BY query_id, "rank"\n'
)


def q_curation_pipeline_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal curation pipeline end-to-end (r15 verdict ask #8 —
    the c4_pipeline / crawl_pipeline composition pattern for BINARY
    modalities): decode -> per-modality near-dup signatures -> union
    dedup graph -> quality gates -> keeper selection, one oracled
    query over items that carry BOTH a video track and an audio track
    (the shape of a real video corpus).

    Fixture (simulated in numpy before committing, playbook rule):
    120 items. Video track = the dedup_video_neardup GIF recipe
    (vbase = item % 30, 4 variants each; variant vr=2 is the
    one-scene-differs near-dup), except items with item % 8 == 7
    render a FLAT clip (every frame scene 0, no jitter -> n_scenes=1,
    the degenerate shape the r15 short-clip guard excludes from
    pairing). Audio track = frame-256 bin-exact tones on the sweep's
    127-bin recipe keyed by abase = item % 45 (45 < 127 so tone bins
    never collide across abases — verified: 0 cross-abase pairs),
    except items with item % 10 == 9 append 6 silence frames after 2
    tone frames (the low-quality shape). The two keys are
    deliberately incommensurate: audio bridges x ~ x+45 ~ x+90 join
    pairs of DISTINCT video families into 8-member components — the
    re-used-soundtrack case neither modality finds alone (12 such
    bridged components, plus smaller ones and 2 singletons).

    Stages (all bucketed, nothing driver-side): video_signature /
    audio_fingerprint decode each blob ONCE into persisted signature
    tables; video_neardup_pairs (banded chunk digests, max_diff=1)
    UNION landmark_matches (min_shared=3, max_bucket=8 — the cap
    stops the (0,0,d) silence landmarks all 12 low-quality items
    share, a 12-member hot bucket) feed connected components; quality
    gates are n_scenes >= 2 (video) and silence_frames*2 < n_frames
    (audio); the keeper is each component's smallest gate-passing
    item (5 components have none). The oracle replays the sampled
    9x8 scene dHashes, the landmark arithmetic, the <=1-mismatch
    pair spec all-pairs, and the reachability closure — reusing the
    ORACLE_DEDUP_VIDEO_NEARDUP / ORACLE_DEDUP_AUDIO_LANDMARK CTE
    specs verbatim where the recipes coincide."""
    import pandas as pd
    from pyspark.sql import Window

    from easydb_server_spark.operators.audiofp import (
        audio_landmarks,
        landmark_matches,
    )
    from easydb_server_spark.operators.clusters import connected_components
    from easydb_server_spark.operators.imagehash import video_neardup_pairs

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select("doc_id")

    def build_sign(batches):
        import numpy as np

        from easydb_server_spark.operators.audiofp import audio_fingerprint_row
        from easydb_server_spark.operators.gif import encode_gif_animated
        from easydb_server_spark.operators.imagehash import video_signature_row
        from easydb_server_spark.operators.wav import encode_wav

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        j = np.arange(256, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                # video track (dedup_video_neardup recipe, vr 0..3;
                # item % 8 == 7 -> flat single-scene clip)
                base, vr = did % 30, did // 30
                w, h = 12 + base % 5, 10 + base % 4
                y, x = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(6):
                    s, jj = (0, 0) if did % 8 == 7 else (f // 2, f % 2)
                    shift9 = 9 if (s == 1 and vr % 3 == 2) else 0
                    idx = (base * 5 + s * 6 + shift9 + y * 5 + x * 7) % 16
                    idx[0, 0] = (idx[0, 0] + jj) % 16
                    frames.append(pal[idx])
                video = encode_gif_animated(frames)
                # audio track (127-bin sweep recipe on abase = item %
                # 45; item % 10 == 9 -> 2 tone + 6 silence frames)
                abase = did % 45
                amp = float(8000 + (did % 5) * 3000)
                ntone = 2 if did % 10 == 9 else 4
                segs = []
                for k in range(ntone):
                    b = 1 + (abase * 7 + 11 * k + 5 * abase * k) % 127
                    segs.append(np.round(amp * np.sin(2.0 * np.pi * b * j / 256.0)))
                if did % 10 == 9:
                    segs.append(np.zeros(256 * 6, dtype=np.float64))
                audio = encode_wav(np.concatenate(segs).astype(np.int16), 8000)
                # r16 (guide §4): sign each track RIGHT HERE — the
                # encode → decode codec round-trip happens inside one
                # Arrow stage (video_signature_row /
                # audio_fingerprint_row ARE the operator bodies, so
                # values are identical to the composed pipeline), and
                # the blobs never cross the JVM↔Python boundary
                _, n_scenes, sig_seq, sig = video_signature_row(did, video)
                _, n_frames, peak_seq, fp = audio_fingerprint_row(
                    did, audio, frame=256, hop=256
                )
                out.append((did, n_scenes, sig_seq, sig, n_frames, peak_seq, fp))
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "n_scenes", "sig_seq", "sig",
                    "n_frames", "peak_seq", "fp",
                ],
            )

    # ONE Python stage + ONE eager materialization for the whole
    # decode/signature surface (was: blobs + vsigs + asigs — three
    # serial checkpointed Python stages); both signature tables are
    # projections of it, persisted before any self-join / multi-
    # consumer stage (the dedup_image_neardup rule)
    # r17 A/B note: spread() here measured flat (2.25 vs 2.22
    # interleaved) — the 120-item codec build is light enough that the
    # repartition + 32-task dispatch cancels the parallelism, the same
    # negative result as the r16 audio sites. Left unspread.
    sigs = d.mapInPandas(
        build_sign,
        "item_id bigint, n_scenes int, sig_seq string, sig string,"
        " n_frames int, peak_seq string, fp string",
    ).localCheckpoint(eager=True)
    vsigs = sigs.select("item_id", "n_scenes", "sig_seq", "sig")
    asigs = sigs.select("item_id", "n_frames", "peak_seq", "fp")
    # r17 A/B note: lazy checkpoints here measured WORSE (median 3.06,
    # spread 1.98-4.89 vs eager 2.50 +-0.3): sigs feeds the video-pair
    # and landmark subtrees, which run as CONCURRENT stages of the CC
    # count job, so an unmaterialized checkpoint is computed twice in
    # parallel (the Python codec stage, the expensive part). Eager
    # stays.
    lms = audio_landmarks(asigs, fanout=3).localCheckpoint(eager=True)

    vpairs = video_neardup_pairs(vsigs, max_diff=1).select("item_a", "item_b")
    apairs = landmark_matches(lms, min_shared=3, max_bucket=8).select(
        "item_a", "item_b"
    )
    edges = vpairs.unionAll(apairs).distinct().select(
        F.col("item_a").alias("doc_a"), F.col("item_b").alias("doc_b")
    )
    cc = connected_components(edges).withColumnRenamed("doc_id", "item_id")

    quality = asigs.select(
        "item_id",
        "n_frames",
        F.size(
            F.filter(F.split("peak_seq", "-"), lambda p: p == F.lit("0"))
        ).alias("silence_frames"),
    )
    w = Window.partitionBy("component")
    return (
        vsigs.select("item_id", "n_scenes")
        .join(quality, "item_id")
        .join(cc, "item_id", "left")
        .withColumn("component", F.coalesce(F.col("component"), F.col("item_id")))
        .withColumn("passes_video", F.col("n_scenes") >= 2)
        .withColumn(
            "passes_audio", F.col("silence_frames") * 2 < F.col("n_frames")
        )
        .withColumn(
            "is_keeper",
            F.col("passes_video")
            & F.col("passes_audio")
            & (
                F.col("item_id")
                == F.min(
                    F.when(
                        F.col("passes_video") & F.col("passes_audio"),
                        F.col("item_id"),
                    )
                ).over(w)
            ),
        )
        .select(
            "item_id", "n_scenes", "n_frames", "silence_frames",
            "passes_video", "passes_audio", "component", "is_keeper",
        )
        .orderBy("item_id")
    )


ORACLE_CURATION_PIPELINE_MM = """
WITH RECURSIVE
mmdocs AS (
  SELECT doc_id, doc_id % 30 AS base, doc_id // 30 AS vr,
         doc_id % 45 AS abase,
         doc_id % 8 = 7 AS vfail, doc_id % 10 = 9 AS afail,
         12 + (doc_id % 30) % 5 AS w, 10 + (doc_id % 30) % 4 AS h
  FROM documents WHERE doc_id < 120
),
mmsamp AS (
  SELECT d.doc_id, d.base, d.vr, d.vfail, ff.f, vv.v, uu.u,
         (uu.u * d.w) // 9 AS sx, (vv.v * d.h) // 8 AS sy
  FROM mmdocs d,
       UNNEST(generate_series(0, 5)) ff(f),
       UNNEST(generate_series(0, 7)) vv(v),
       UNNEST(generate_series(0, 8)) uu(u)
),
mmgry AS (
  SELECT doc_id, f, v, u,
         (299 * ((idx * 16) % 256) + 587 * ((idx * 37) % 256)
          + 114 * ((idx * 73) % 256)) // 1000 AS gr
  FROM (
    SELECT doc_id, f, v, u,
           ((base * 5 + (CASE WHEN vfail THEN 0 ELSE f // 2 END) * 6
             + CASE WHEN NOT vfail AND f // 2 = 1 AND vr % 3 = 2 THEN 9 ELSE 0 END
             + sy * 5 + sx * 7) % 16
            + CASE WHEN sy = 0 AND sx = 0
                   THEN (CASE WHEN vfail THEN 0 ELSE f % 2 END) ELSE 0 END) % 16 AS idx
    FROM mmsamp
  )
),
mmbits AS (
  SELECT l.doc_id, l.f, l.v * 8 + l.u AS i,
         CASE WHEN l.gr < r.gr THEN 1 ELSE 0 END AS bit
  FROM mmgry l JOIN mmgry r ON r.doc_id = l.doc_id AND r.f = l.f
                           AND r.v = l.v AND r.u = l.u + 1
  WHERE l.u < 8
),
mmbnd AS (
  SELECT doc_id, f, i // 16 AS b,
         CAST(SUM(CAST(bit AS BIGINT) << (i % 16)) AS BIGINT) AS bv
  FROM mmbits GROUP BY doc_id, f, i // 16
),
mmsig AS (
  SELECT doc_id, f,
         MAX(CASE WHEN b = 0 THEN bv END) AS band0,
         MAX(CASE WHEN b = 1 THEN bv END) AS band1,
         MAX(CASE WHEN b = 2 THEN bv END) AS band2,
         MAX(CASE WHEN b = 3 THEN bv END) AS band3
  FROM mmbnd GROUP BY doc_id, f
),
mmham AS (
  SELECT c.doc_id, c.f,
         printf('%04x%04x%04x%04x', c.band3, c.band2, c.band1, c.band0) AS ph,
         (p.band0 IS NULL
          OR bit_count(xor(c.band0, p.band0)) + bit_count(xor(c.band1, p.band1))
             + bit_count(xor(c.band2, p.band2)) + bit_count(xor(c.band3, p.band3)) > 3)
           AS is_start
  FROM mmsig c LEFT JOIN mmsig p ON p.doc_id = c.doc_id AND p.f = c.f - 1
),
mmscenes AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_scenes,
         string_agg(ph, '-' ORDER BY f) AS sig_seq
  FROM mmham WHERE is_start GROUP BY doc_id
),
mmvpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM mmscenes a JOIN mmscenes b ON b.n_scenes = a.n_scenes AND a.doc_id < b.doc_id
  WHERE a.n_scenes > 1
    AND len(list_filter(generate_series(1, a.n_scenes),
        i -> string_split(a.sig_seq, '-')[i] <> string_split(b.sig_seq, '-')[i])) <= 1
),
mmaframes AS (
  SELECT d.doc_id, tt.t,
         CASE WHEN d.afail AND tt.t >= 2 THEN 0
              ELSE 1 + (d.abase * 7 + 11 * tt.t + 5 * d.abase * tt.t) % 127
         END AS p
  FROM mmdocs d,
       UNNEST(generate_series(0, CASE WHEN d.afail THEN 7 ELSE 3 END)) tt(t)
),
mmlm AS (
  SELECT DISTINCT a.doc_id, a.p * 1048576 + b.p * 1024 + (b.t - a.t) AS lm
  FROM mmaframes a JOIN mmaframes b
    ON b.doc_id = a.doc_id AND b.t - a.t BETWEEN 1 AND 3
),
mmkeep AS (
  SELECT doc_id, lm FROM mmlm
  WHERE lm IN (SELECT lm FROM mmlm GROUP BY lm HAVING COUNT(*) <= 8)
),
mmapairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM mmkeep x JOIN mmkeep y ON y.lm = x.lm AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
  HAVING COUNT(*) >= 3
),
mmedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mmvpairs
  UNION SELECT doc_b, doc_a FROM mmvpairs
  UNION SELECT doc_a, doc_b FROM mmapairs
  UNION SELECT doc_b, doc_a FROM mmapairs
),
mmreach AS (
  SELECT src, dst FROM mmedges
  UNION
  SELECT r.src, e.dst FROM mmreach r JOIN mmedges e ON r.dst = e.src
),
mmlabels AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
  FROM mmreach GROUP BY src
),
mmquality AS (
  SELECT d.doc_id,
         CASE WHEN d.afail THEN 8 ELSE 4 END AS n_frames,
         CASE WHEN d.afail THEN 6 ELSE 0 END AS silence_frames
  FROM mmdocs d
),
mmrows AS (
  SELECT s.doc_id AS item_id, s.n_scenes,
         CAST(q.n_frames AS INT) AS n_frames,
         CAST(q.silence_frames AS INT) AS silence_frames,
         s.n_scenes >= 2 AS passes_video,
         q.silence_frames * 2 < q.n_frames AS passes_audio,
         COALESCE(l.component, s.doc_id) AS component
  FROM mmscenes s
  JOIN mmquality q ON q.doc_id = s.doc_id
  LEFT JOIN mmlabels l ON l.doc_id = s.doc_id
)
SELECT item_id, n_scenes, n_frames, silence_frames,
       passes_video, passes_audio, component,
       passes_video AND passes_audio AND item_id = MIN(
         CASE WHEN passes_video AND passes_audio THEN item_id END
       ) OVER (PARTITION BY component) AS is_keeper
FROM mmrows
ORDER BY item_id
"""


def q_audio_landmark_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark retrieval generalized to k distinct matches (the
    phash_topk / sim_topk_* surface for the timed-landmark
    modalities): top-3 index clips per query over the
    audio_landmark_search fixture. Every index clip of a query's base
    group carries the IDENTICAL landmark set, so each receives the
    same vote count at the same offset and the per-query ranking
    (votes DESC, match_id) returns the base's three smallest doc_ids
    — the per-match best-cell reduction guarantees each match appears
    once, and the whole ordering is deterministic on both engines.
    The oracle reuses the search oracle's CTE chain verbatim with the
    two-window ranking tail."""
    import pandas as pd

    from easydb_server_spark.operators.audiofp import (
        audio_landmarks_timed,
        landmark_search_topk,
    )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.audiofp import (
            audio_fingerprint_row,
        )
        from easydb_server_spark.operators.wav import encode_wav

        j = np.arange(64, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                if did < 400:
                    base, off, nseg = did % 30, 0, 4
                else:
                    base = (did - 400) % 30
                    off = 1 + did % 3
                    nseg = 3 if did % 2 == 1 else 4
                amp = float(8000 + (did % 5) * 3000)
                segs = [np.zeros(64 * off, dtype=np.float64)] if off else []
                for k in range(nseg):
                    b = 1 + (base * 7 + k * 11 + base * k * 5) % 31
                    segs.append(np.round(amp * np.sin(2.0 * np.pi * b * j / 64.0)))
                s = np.concatenate(segs).astype(np.int16)
                # r16 (guide §4): fingerprint right here — the encode
                # → decode codec round-trip stays inside this one
                # Arrow stage (audio_fingerprint_row IS the operator
                # body), and the WAV blobs never cross the JVM↔Python
                # boundary
                out.append(audio_fingerprint_row(did, encode_wav(s, 8000), 64, 64))
            yield pd.DataFrame(
                out, columns=["item_id", "n_frames", "peak_seq", "fp"]
            )

    sigs = d.mapInPandas(
        build, "item_id bigint, n_frames int, peak_seq string, fp string"
    )
    # persist once; both the index and the query side slice from it
    lms = audio_landmarks_timed(sigs, fanout=3).localCheckpoint(eager=True)
    return landmark_search_topk(
        lms.where(F.col("item_id") < 400),
        lms.where(F.col("item_id") >= 400),
        k=3,
        min_votes=3,
        max_bucket=48,
    ).orderBy("query_id", "rank")


# Same fixture, same CTE chain as the search oracle — only the ranking
# tail differs: each match's best cell (votes DESC, smaller offset)
# first, then k=3 distinct matches per query by (votes DESC,
# match_id). "offset"/"rank" quoted: DuckDB reserved/keyword.
ORACLE_AUDIO_LANDMARK_TOPK = (
    ORACLE_AUDIO_LANDMARK_SEARCH.rsplit("ranked AS (", 1)[0]
    + '''bestcell AS (
  SELECT query_id, match_id, "offset", votes,
         ROW_NUMBER() OVER (
           PARTITION BY query_id, match_id ORDER BY votes DESC, "offset"
         ) AS mrn
  FROM cells
),
mranked AS (
  SELECT query_id, match_id, "offset", votes,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY votes DESC, match_id
         ) AS INT) AS "rank"
  FROM bestcell WHERE mrn = 1
)
SELECT query_id, match_id, "offset", votes, "rank"
FROM mranked WHERE "rank" <= 3
ORDER BY query_id, "rank"
'''
)


def q_audio_landmark_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup audio ingest (the landmark family's
    incremental_dedup, closing the per-modality index-lifecycle
    matrix): corpus = 360 source clips (base = doc % 30, the
    audio-landmark recipe, 12 identical recordings per base); the new
    batch = 100 gain/pad/trim copies (doc_id 360-459 — must be
    REJECTED against the corpus), 20 genuinely novel recordings
    (doc_id 460-479, recipe 1+(j*13+17k+7jk)%31 — verified in numpy:
    20 distinct landmark sets, no novel-novel pair shares >= 3), and
    20 in-batch duplicates of those novels (doc_id 480-499, different
    gain — caught by the batch self-match, keeper = the smaller id).
    Everything fits inside doc_id < 500: the sf0.01/sf0.001 documents
    tables stop there, and a fixture id past the table silently
    shrinks the batch (caught when the first cut returned 100 rows
    instead of 140).

    Two planted coincidences are the documented FP floor, simulated
    before committing and replayed by the oracle: novel recipes j=8
    and j=18 share exactly 3 landmarks AT ONE ALIGNMENT with corpus
    bases 0 and 14, so docs 468/478 (and their in-batch duplicates)
    are falsely corpus-rejected at min_votes=3 — the classic
    min-votes trade of landmark fingerprinting. Expected admits: the
    18 other novel originals.

    The conformance query builds the corpus landmarks inline; the
    durable bucketed-table path (write/append/compact + the
    exchange-free probe plan) is pytest-locked
    (tests/test_audiofp.py::test_landmark_index_lifecycle*)."""
    import pandas as pd

    from easydb_server_spark.operators.audiofp import (
        audio_landmarks_timed,
        incremental_landmark_admit,
    )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.audiofp import (
            audio_fingerprint_row,
        )
        from easydb_server_spark.operators.wav import encode_wav

        j = np.arange(64, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                if did < 360:
                    base, off, nseg, novel = did % 30, 0, 4, None
                elif did < 460:
                    base = (did - 360) % 30
                    off = 1 + did % 3
                    nseg = 3 if did % 2 == 1 else 4
                    novel = None
                else:
                    base, off, nseg, novel = None, 0, 4, (did - 460) % 20
                amp = float(8000 + (did % 5) * 3000)
                segs = [np.zeros(64 * off, dtype=np.float64)] if off else []
                for k in range(nseg):
                    if novel is None:
                        b = 1 + (base * 7 + k * 11 + base * k * 5) % 31
                    else:
                        b = 1 + (novel * 13 + 17 * k + 7 * novel * k) % 31
                    segs.append(np.round(amp * np.sin(2.0 * np.pi * b * j / 64.0)))
                s = np.concatenate(segs).astype(np.int16)
                # r16 (guide §4): fingerprint right here — the encode
                # → decode codec round-trip stays inside this one
                # Arrow stage (audio_fingerprint_row IS the operator
                # body), and the WAV blobs never cross the JVM↔Python
                # boundary
                out.append(audio_fingerprint_row(did, encode_wav(s, 8000), 64, 64))
            yield pd.DataFrame(
                out, columns=["item_id", "n_frames", "peak_seq", "fp"]
            )

    # r17 A/B note: spread() measured WORSE here (1.68 vs 1.45
    # interleaved) — same negative result as the r16 audio sites
    sigs = d.mapInPandas(
        build, "item_id bigint, n_frames int, peak_seq string, fp string"
    )
    # persist once; corpus and batch sides slice from it
    # r17 (guide §5, the BPE lazy-checkpoint play): eager=False fuses
    # the checkpoint materialization into the admit plan's first pass
    # (one job fewer per run); A/B median 1.60 -> 1.33 s, max 3.3 ->
    # 1.6 s at sf0.1. The corpus and batch slices both read the SAME
    # materialized RDD partitions afterwards.
    lms = audio_landmarks_timed(sigs, fanout=3).localCheckpoint(eager=False)
    return incremental_landmark_admit(
        lms.where(F.col("item_id") < 360),
        lms.where(F.col("item_id") >= 360),
        min_votes=3,
        max_bucket=48,
    ).orderBy("item_id")


ORACLE_AUDIO_LANDMARK_INCREMENTAL = """
WITH ildocs AS (
  SELECT doc_id,
         CASE WHEN doc_id < 360 THEN doc_id % 30
              WHEN doc_id < 460 THEN (doc_id - 360) % 30
              ELSE NULL END AS base,
         CASE WHEN doc_id >= 460 THEN (doc_id - 460) % 20 ELSE NULL END AS nv,
         CASE WHEN doc_id >= 360 AND doc_id < 460 THEN 1 + doc_id % 3 ELSE 0 END AS off,
         CASE WHEN doc_id >= 360 AND doc_id < 460 AND doc_id % 2 = 1 THEN 3 ELSE 4 END AS nseg
  FROM documents WHERE doc_id < 500
),
ilframes AS (
  SELECT d.doc_id, tt.t,
         CASE WHEN tt.t < d.off THEN 0
              WHEN d.nv IS NULL THEN
                1 + (d.base * 7 + (tt.t - d.off) * 11
                     + d.base * (tt.t - d.off) * 5) % 31
              ELSE 1 + (d.nv * 13 + 17 * tt.t + 7 * d.nv * tt.t) % 31
         END AS p
  FROM ildocs d, UNNEST(generate_series(0, d.off + d.nseg - 1)) tt(t)
),
illmt AS (
  SELECT a.doc_id, a.t, a.p * 1048576 + b.p * 1024 + (b.t - a.t) AS lm
  FROM ilframes a JOIN ilframes b
    ON b.doc_id = a.doc_id AND b.t - a.t BETWEEN 1 AND 3
),
ilidx AS (SELECT doc_id, t, lm FROM illmt WHERE doc_id < 360),
ilidxkeep AS (
  SELECT doc_id, t, lm FROM ilidx
  WHERE lm IN (
    SELECT lm FROM (SELECT DISTINCT doc_id, lm FROM ilidx)
    GROUP BY lm HAVING COUNT(*) <= 48
  )
),
ilcells AS (
  SELECT q.doc_id AS item_id, x.doc_id AS match_id,
         x.t - q.t AS off_cell, CAST(COUNT(*) AS INT) AS votes
  FROM (SELECT doc_id, t, lm FROM illmt WHERE doc_id >= 360) q
  JOIN ilidxkeep x ON x.lm = q.lm
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 3
),
ilbest AS (
  SELECT item_id, match_id AS corpus_match, votes AS corpus_votes,
         ROW_NUMBER() OVER (
           PARTITION BY item_id ORDER BY votes DESC, match_id, off_cell
         ) AS rn
  FROM ilcells
),
ilblm AS (
  SELECT DISTINCT doc_id, lm FROM illmt WHERE doc_id >= 360
),
ilbkeep AS (
  SELECT doc_id, lm FROM ilblm
  WHERE lm IN (SELECT lm FROM ilblm GROUP BY lm HAVING COUNT(*) <= 48)
),
ilbpairs AS (
  SELECT x.doc_id AS item_a, y.doc_id AS item_b
  FROM ilbkeep x JOIN ilbkeep y ON y.lm = x.lm AND x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
ilbfirst AS (
  SELECT item_b AS item_id, MIN(item_a) AS batch_match
  FROM ilbpairs GROUP BY item_b
)
SELECT d.doc_id AS item_id,
       b.corpus_match, b.corpus_votes, f.batch_match,
       b.corpus_match IS NULL AND f.batch_match IS NULL AS admitted
FROM (SELECT doc_id FROM ildocs WHERE doc_id >= 360) d
LEFT JOIN (SELECT * FROM ilbest WHERE rn = 1) b ON b.item_id = d.doc_id
LEFT JOIN ilbfirst f ON f.item_id = d.doc_id
ORDER BY item_id
"""


def q_stream_landmark_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous near-dup audio ingest run as a REAL streaming job
    (streaming/ingest.stream_landmark_ingest, availableNow over two
    mtime-ordered micro-batch files): batch 0 is 60 clips — bases
    0..29 (the audio-landmark recipe) each appearing twice, so the 30
    seconds (doc 30..59) are in-batch rejected and ONLY docs 0..29
    enter the index; batch 1 is 40 pad/trim copies (doc 60..99, base
    (doc-60) %% 30 — every one corpus-matched against the index that
    batch 0 built, proving cross-batch state flows through the
    TABLE, not streaming state) plus 20 novel recordings (doc
    100..119, the incremental fixture's novel recipe, including its
    two numpy-verified min_votes coincidences: novel j=8/j=18 share 3
    aligned landmarks with bases 0/14, so docs 108/118 are falsely
    corpus-rejected — and 108 also batch-matches the base-0 copy 60,
    118 the base-14 copy 74, because landmark_matches needs no
    alignment). The oracle replays both generations: batch-0
    self-matching, the admitted set, batch-1 offset voting against
    exactly that set, and batch-1 self-matching.

    Side-effect entry (the pq_store_lifecycle class): drops/rebuilds
    the fixed warehouse table and uses fresh temp dirs per run, so the
    query is idempotent; stays conformance-only, never benched."""
    import os
    import tempfile

    import pandas as pd

    from easydb_server_spark.streaming.ingest import (
        AUDIO_BLOB_SCHEMA,
        stream_landmark_ingest,
    )

    table = "lm_ingest_conf"
    # DROP TABLE alone leaves the warehouse directory behind when a
    # PREVIOUS session wrote the table (fresh catalogs don't know it);
    # the streaming append's saveAsTable then dies with
    # LOCATION_ALREADY_EXISTS. Clear both, like every other store op.
    from easydb_server_spark.operators.pq import _drop_table_and_location

    _drop_table_and_location(spark, table)
    work = tempfile.mkdtemp(prefix="lm_ingest_conf_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select("doc_id")

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import encode_wav

        j = np.arange(64, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                if did < 60:
                    base, off, nseg, novel = did % 30, 0, 4, None
                elif did < 100:
                    base = (did - 60) % 30
                    off = 1 + did % 3
                    nseg = 3 if did % 2 == 1 else 4
                    novel = None
                else:
                    base, off, nseg, novel = None, 0, 4, did - 100
                amp = float(8000 + (did % 5) * 3000)
                segs = [np.zeros(64 * off, dtype=np.float64)] if off else []
                for k in range(nseg):
                    if novel is None:
                        b = 1 + (base * 7 + k * 11 + base * k * 5) % 31
                    else:
                        b = 1 + (novel * 13 + 17 * k + 7 * novel * k) % 31
                    segs.append(np.round(amp * np.sin(2.0 * np.pi * b * j / 64.0)))
                s = np.concatenate(segs).astype(np.int16)
                out.append((did, encode_wav(s, 8000)))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    blobs = d.mapInPandas(build, "item_id bigint, payload binary").collect()

    import pyarrow as pa
    import pyarrow.parquet as papq

    for name, lo, hi, order in (("b0.parquet", 0, 60, 0), ("b1.parquet", 60, 120, 1)):
        rows = [r for r in blobs if lo <= r["item_id"] < hi]
        t = pa.table(
            {
                "item_id": pa.array([r["item_id"] for r in rows], pa.int64()),
                "payload": pa.array([bytes(r["payload"]) for r in rows], pa.binary()),
            }
        )
        path = os.path.join(in_dir, name)
        papq.write_table(t, path)
        mt = 1_700_000_000 + order * 60
        os.utime(path, (mt, mt))

    src = (
        spark.readStream.schema(AUDIO_BLOB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_landmark_ingest(
        src,
        "payload",
        "item_id",
        table,
        os.path.join(work, "decisions"),
        os.path.join(work, "ckpt"),
        min_votes=3,
        max_bucket=48,
    )
    q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(work, "decisions"))
        .select(
            "item_id",
            "corpus_match",
            "corpus_votes",
            "batch_match",
            "admitted",
            F.col("batch_id").cast("int").alias("bid"),
        )
        .orderBy("item_id")
    )


# Replays BOTH micro-batch generations of the streaming ingest: the
# sl* CTE chain is the il* incremental chain with the index defined as
# batch 0's ADMITTED clips instead of a static corpus.
ORACLE_STREAM_LANDMARK_INGEST = """
WITH sldocs AS (
  SELECT doc_id,
         CASE WHEN doc_id < 60 THEN doc_id % 30
              WHEN doc_id < 100 THEN (doc_id - 60) % 30
              ELSE NULL END AS base,
         CASE WHEN doc_id >= 100 THEN doc_id - 100 ELSE NULL END AS nv,
         CASE WHEN doc_id >= 60 AND doc_id < 100 THEN 1 + doc_id % 3 ELSE 0 END AS off,
         CASE WHEN doc_id >= 60 AND doc_id < 100 AND doc_id % 2 = 1 THEN 3 ELSE 4 END AS nseg
  FROM documents WHERE doc_id < 120
),
slframes AS (
  SELECT d.doc_id, tt.t,
         CASE WHEN tt.t < d.off THEN 0
              WHEN d.nv IS NULL THEN
                1 + (d.base * 7 + (tt.t - d.off) * 11
                     + d.base * (tt.t - d.off) * 5) % 31
              ELSE 1 + (d.nv * 13 + 17 * tt.t + 7 * d.nv * tt.t) % 31
         END AS p
  FROM sldocs d, UNNEST(generate_series(0, d.off + d.nseg - 1)) tt(t)
),
sllmt AS (
  SELECT a.doc_id, a.t, a.p * 1048576 + b.p * 1024 + (b.t - a.t) AS lm
  FROM slframes a JOIN slframes b
    ON b.doc_id = a.doc_id AND b.t - a.t BETWEEN 1 AND 3
),
-- batch 0: empty corpus, in-batch matching only
b0lm AS (SELECT DISTINCT doc_id, lm FROM sllmt WHERE doc_id < 60),
b0keep AS (
  SELECT doc_id, lm FROM b0lm
  WHERE lm IN (SELECT lm FROM b0lm GROUP BY lm HAVING COUNT(*) <= 48)
),
b0pairs AS (
  SELECT x.doc_id AS item_a, y.doc_id AS item_b
  FROM b0keep x JOIN b0keep y ON y.lm = x.lm AND x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
b0first AS (
  SELECT item_b AS item_id, MIN(item_a) AS batch_match
  FROM b0pairs GROUP BY item_b
),
b0rows AS (
  SELECT d.doc_id AS item_id,
         CAST(NULL AS BIGINT) AS corpus_match,
         CAST(NULL AS INT) AS corpus_votes,
         f.batch_match,
         f.batch_match IS NULL AS admitted,
         0 AS bid
  FROM (SELECT doc_id FROM sldocs WHERE doc_id < 60) d
  LEFT JOIN b0first f ON f.item_id = d.doc_id
),
-- the index batch 1 probes = batch 0's admitted clips
slidx AS (
  SELECT l.doc_id, l.t, l.lm FROM sllmt l
  JOIN b0rows r ON r.item_id = l.doc_id AND r.admitted
),
slidxkeep AS (
  SELECT doc_id, t, lm FROM slidx
  WHERE lm IN (
    SELECT lm FROM (SELECT DISTINCT doc_id, lm FROM slidx)
    GROUP BY lm HAVING COUNT(*) <= 48
  )
),
b1cells AS (
  SELECT q.doc_id AS item_id, x.doc_id AS match_id,
         x.t - q.t AS off_cell, CAST(COUNT(*) AS INT) AS votes
  FROM (SELECT doc_id, t, lm FROM sllmt WHERE doc_id >= 60) q
  JOIN slidxkeep x ON x.lm = q.lm
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 3
),
b1best AS (
  SELECT item_id, match_id AS corpus_match, votes AS corpus_votes,
         ROW_NUMBER() OVER (
           PARTITION BY item_id ORDER BY votes DESC, match_id, off_cell
         ) AS rn
  FROM b1cells
),
b1lm AS (SELECT DISTINCT doc_id, lm FROM sllmt WHERE doc_id >= 60),
b1keep AS (
  SELECT doc_id, lm FROM b1lm
  WHERE lm IN (SELECT lm FROM b1lm GROUP BY lm HAVING COUNT(*) <= 48)
),
b1pairs AS (
  SELECT x.doc_id AS item_a, y.doc_id AS item_b
  FROM b1keep x JOIN b1keep y ON y.lm = x.lm AND x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
b1first AS (
  SELECT item_b AS item_id, MIN(item_a) AS batch_match
  FROM b1pairs GROUP BY item_b
),
b1rows AS (
  SELECT d.doc_id AS item_id,
         b.corpus_match, b.corpus_votes, f.batch_match,
         b.corpus_match IS NULL AND f.batch_match IS NULL AS admitted,
         1 AS bid
  FROM (SELECT doc_id FROM sldocs WHERE doc_id >= 60) d
  LEFT JOIN (SELECT * FROM b1best WHERE rn = 1) b ON b.item_id = d.doc_id
  LEFT JOIN b1first f ON f.item_id = d.doc_id
)
SELECT item_id, corpus_match, corpus_votes, batch_match, admitted, CAST(bid AS INT) AS bid
FROM (SELECT * FROM b0rows UNION ALL SELECT * FROM b1rows)
ORDER BY item_id
"""
