"""[EXT] Web-corpus curation ops: URL canonicalization + per-domain
stats, and corpus-level inverted-index (postings) statistics.

Web-scale training corpora are keyed by URL: canonicalizing URLs
(lowercase scheme/host, strip fragments and tracking params) is the
first dedup key, and per-domain document counts drive source mixing
and domain blocklists. The harness tables carry no URL column, so the
query synthesizes a deterministic URL per document from (source,
doc_id, lang) — messy on purpose (mixed case, utm/ref params, a
fragment) — then canonicalizes it back with pure string expressions.
Everything is whole-stage-codegen `regexp_*`/`lower` over one scan +
one small aggregate: at 100 TB this is a map-side projection plus a
shuffle on the (bounded) domain key.

The postings query is the build step of an inverted index: token →
document frequency + total term frequency. Explode shuffles on the
token key; the result is bounded by vocabulary size, not corpus size.

Reference anchor: the reference keys its sink by a sanitized name
(file_output_manager.py:43-44) — same normalize-then-key discipline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

# Shared synthetic-URL recipe (both engines build the identical string):
#   HTTPS://{SOURCE}.Example.COM/docs/{doc_id}?utm_source=x&ref={lang}#s1
def _url_spark():
    # Built lazily: Column construction needs an active SparkContext.
    return F.concat(
        F.lit("HTTPS://"),
        F.upper(F.col("source")),
        F.lit(".Example.COM/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=x&ref="),
        F.col("lang"),
        F.lit("#s1"),
    )

_URL_SQL = (
    "concat('HTTPS://', upper(source), '.Example.COM/docs/', "
    "CAST(doc_id AS VARCHAR), '?utm_source=x&ref=', lang, '#s1')"
)

_DOMAIN_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, {_URL_SQL} AS url FROM documents
),
canon AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS domain,
         regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path
  FROM raw
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT path) AS BIGINT) AS n_unique_paths,
       MIN(path) AS first_path
FROM canon
GROUP BY domain
"""


@register("web_domain_stats", _DOMAIN_ORACLE)
def web_domain_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    raw = d.select("doc_id", _url_spark().alias("url"))
    canon = raw.select(
        "doc_id",
        F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)).alias(
            "domain"
        ),
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1).alias(
            "path"
        ),
    )
    return canon.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("path").alias("n_unique_paths"),
        F.min("path").alias("first_path"),
    )


# --------------------------------------------------------------------------
# Inverted-index postings stats: per token, document frequency and
# total term frequency; top 25 by df with a total tiebreak order so
# the result is deterministic in any engine.
# --------------------------------------------------------------------------

_POSTINGS_ORACLE = """
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
postings AS (
  SELECT token,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
         CAST(COUNT(*) AS BIGINT) AS term_freq
  FROM tokens WHERE token <> '' GROUP BY token
)
SELECT token, doc_freq, term_freq
FROM postings
ORDER BY doc_freq DESC, term_freq DESC, token ASC
LIMIT 25
"""


@register("text_inverted_postings", _POSTINGS_ORACLE)
def text_inverted_postings(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    postings = tokens.groupBy("token").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("term_freq"),
    )
    return postings.orderBy(
        F.col("doc_freq").desc(), F.col("term_freq").desc(), F.col("token").asc()
    ).limit(25)
