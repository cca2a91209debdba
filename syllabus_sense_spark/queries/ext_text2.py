"""[EXT] Text analysis, batch 2: TF-IDF, BPE-ish subword token
estimation, Arrow scalar pandas UDF surface, multimodal frame
sampling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..tables import load
from . import register

# --- TF-IDF: top term per document ----------------------------------------
# tf = in-doc count, idf = ln(N/df). Deterministic to the last bit
# except ln(); one ln per term and an integer-scaled output
# (floor(x*1e6) as bigint — no engine-specific round-half convention)
# keeps both engines aligned.

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT d.doc_id, t.tok
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE length(t.tok) > 0
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
  FROM scored
)
SELECT doc_id, tok AS top_term, CAST(floor(tfidf * 1e6) AS BIGINT) AS tfidf_e6
FROM ranked WHERE rn = 1
"""


@register("text_tfidf_top_term", _TFIDF_ORACLE)
def text_tfidf_top_term(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar dimension; at scale a broadcast agg
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    # tf is materialized once and df DERIVES from it: tf rows are
    # distinct (doc, tok) pairs, so count-per-tok over tf IS the
    # document frequency — deriving it from the raw token table
    # instead re-ran the scan + explode over every token instance
    # plus a countDistinct expansion (Catalyst does not CSE across
    # consumers; the r11 sweep caught this query at 9.5x/decade).
    # df is vocabulary-sized — broadcast (checkpointed lineage
    # carries no stats, so the auto-threshold never fires); at a
    # corpus whose vocabulary outgrows broadcast, drop the hint and
    # this becomes the standard shuffled tf x idf join.
    from ._util import rotate_checkpoint, ser_checkpoint

    # rotated: backs the returned result; next invocation releases it
    tf = rotate_checkpoint(
        "ext_text2.tfidf.tf",
        ser_checkpoint(
            toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
        ),
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "tok").select(
        "doc_id",
        "tok",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("tok").alias("top_term"),
            F.floor(F.col("tfidf") * F.lit(1e6)).cast("bigint").alias("tfidf_e6"),
        )
    )


# --- BPE-ish token estimate ------------------------------------------------
# Whitespace words + a subword estimate: ceil(len(word)/4) pieces per
# word — the standard chars/4 heuristic, purely relational.

_BPE_ORACLE = """
WITH toks AS (
  SELECT d.doc_id, t.tok
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE length(t.tok) > 0
)
SELECT
  doc_id,
  COUNT(*) AS n_words,
  CAST(SUM(CAST(ceil(length(tok) / 4.0) AS BIGINT)) AS BIGINT) AS n_bpe_est,
  CAST(SUM(length(tok)) AS BIGINT) AS n_word_chars
FROM toks
GROUP BY doc_id
"""


@register("text_bpe_token_estimate", _BPE_ORACLE)
def text_bpe_token_estimate(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.ceil(F.length("tok") / 4.0).cast("long")).cast("long").alias("n_bpe_est"),
        F.sum(F.length("tok")).cast("long").alias("n_word_chars"),
    )


# --- Arrow scalar pandas UDF ----------------------------------------------
# The @pandas_udf scalar surface (SURVEY.md §2 "UDF surface" row):
# vectorized batch in, Series out. The computation is mirrored
# relationally in the oracle, so even the UDF path is value-checked.


@pandas_udf(T.LongType())
def _vowel_count(texts: pd.Series) -> pd.Series:
    return texts.str.count("[aeiou]").astype("int64")


_PUDF_ORACLE = """
SELECT
  doc_id,
  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
    AS n_vowels
FROM documents
WHERE doc_id % 10 = 3
"""


@register("pandas_udf_vowel_count", _PUDF_ORACLE)
def pandas_udf_vowel_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 3)
    return d.select("doc_id", _vowel_count(F.col("text")).alias("n_vowels"))


# --- multimodal frame sampling --------------------------------------------
# 1→N expansion per media item (frame extraction): mapInPandas yields
# one row per sampled frame; the fake sampler's frame count/offsets
# are integer math the oracle reproduces.

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_offset_ms", T.LongType(), False),
    ]
)

_FRAMES_ORACLE = """
SELECT
  doc_id,
  CAST(unnest(range(1 + doc_id % 4)) AS BIGINT) AS frame_idx,
  CAST(unnest(range(1 + doc_id % 4)) * 250 AS BIGINT) AS frame_offset_ms
FROM documents
WHERE doc_id % 5 = 2
"""


@register("multimodal_frame_sample", _FRAMES_ORACLE)
def multimodal_frame_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 2)
    media = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                if not isinstance(row["payload"], (bytes, bytearray)):
                    raise NotImplementedError("payload must be binary")
                n_frames = 1 + int(row["doc_id"]) % 4
                for i in range(n_frames):
                    recs.append(
                        {
                            "doc_id": int(row["doc_id"]),
                            "frame_idx": i,
                            "frame_offset_ms": i * 250,
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(sample, FRAME_SCHEMA)
