"""[EXT] Training-data curation, part 17: domain-targeted data
selection by importance weighting (DSIR-style), exact to the last bit.

``training_importance_selection`` ranks every document by how
target-domain-like its vocabulary is — the data-selection step used
to curate a pretraining mix toward a domain (Xie et al.'s Data
Selection via Importance Resampling reduces to comparing each
document's likelihood under a target vs a raw language model). The
hashed-unigram variant here uses occurrence-weighted count ratios,
kept in EXACT integer arithmetic so an eigen-float never touches the
hash:

1. unigram counts over the space-split tokens (the repo's canonical
   tokenization, ext_text.py:30): ``c_t(w)`` from the target slice
   (lang = 'en'), ``c_r(w)`` from the full corpus, plus their totals
   ``T_t``, ``T_r``.
2. per document, the occurrence-weighted sums ``num = sum c_t(w)``
   and ``den = sum c_r(w)`` over its token stream (duplicates count —
   term frequency matters).
3. score_ppm = (num * T_r * 1e6) DIV (den * T_t) — the cross-
   multiplied rational form of (num/T_t)/(den/T_r), a sum-form
   importance ratio, computed in DECIMAL(38,0) (Spark) / HUGEINT
   (DuckDB); positive everywhere so truncate-vs-floor agree
   (SCALE.md DIV trap).
4. select the top 25 by (score_ppm DESC, doc_id) — deterministic
   total order.

Scale posture: token explode is map-side; the counts tables are a
vocabulary-sized dictionary — broadcast it when it fits (the plan
here), AQE skew-join when it doesn't (natural-language token
frequency is Zipfian, the textbook skewed key set). The per-doc
aggregation re-partitions by doc_id — no hot keys. The final top-k is
a TakeOrderedAndProject, O(k) per partition. At 100 TB every stage is
a bucketed or broadcast equi-join; nothing is all-pairs.

Reference anchor: none ([EXT] per SURVEY.md §2 — training-curation
family; method: DSIR, Xie et al. 2023, public).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_TOP_K = 25
_SCALE = 1_000_000

_IMPORTANCE_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '),
                                          x -> length(x) > 0)) AS tok
  FROM documents
),
raw_counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_r FROM occ GROUP BY tok
),
tgt_counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_t FROM occ
  WHERE lang = 'en' GROUP BY tok
),
totals AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS t_r,
         (SELECT CAST(SUM(c_t) AS BIGINT) FROM tgt_counts) AS t_t
  FROM raw_counts
),
doc_sums AS (
  SELECT o.doc_id,
         CAST(SUM(COALESCE(t.c_t, 0)) AS BIGINT) AS num,
         CAST(SUM(r.c_r) AS BIGINT) AS den
  FROM occ o
  JOIN raw_counts r ON r.tok = o.tok
  LEFT JOIN tgt_counts t ON t.tok = o.tok
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       CAST((CAST(d.num AS HUGEINT) * tt.t_r * {_SCALE})
            // (CAST(d.den AS HUGEINT) * tt.t_t) AS BIGINT) AS score_ppm
FROM doc_sums d CROSS JOIN totals tt
ORDER BY score_ppm DESC, d.doc_id
LIMIT {_TOP_K}
"""


_VOCAB_TOTALS_CACHE: dict = {}


def _importance_vocab(spark, sf_dir):
    """The (tok, c_r, c_t) dictionary as a SESSION ARTIFACT (it
    derives purely from the corpus — the DF-table/BPE-word-types
    class; the r14 first cut rebuilt it per invocation as a rotated
    checkpoint), plus the two corpus totals collected once per
    (session, sf_dir) — driver arithmetic on a bounded table, so the
    per-invocation totals aggregate and its broadcast build are gone.
    ONE occurrence pass builds both dictionary columns (conditional
    count); c_t is 0, not NULL, for tokens with no target
    occurrences, which the old left-join+coalesce produced
    identically."""
    from ._util import ser_checkpoint
    from .ext_dedup import session_artifact

    def build():
        docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
        occ = docs.select(
            "lang",
            F.explode(
                F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
            ).alias("tok"),
        )
        return ser_checkpoint(
            occ.groupBy("tok").agg(
                F.count(F.lit(1)).alias("c_r"),
                F.count(F.when(F.col("lang") == "en", 1)).alias("c_t"),
            )
        )

    vocab = session_artifact(
        spark, sf_dir, "importance_vocab", build, persist=False
    )
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _VOCAB_TOTALS_CACHE:
        row = vocab.agg(
            F.sum("c_r").alias("t_r"), F.sum("c_t").alias("t_t")
        ).first()
        _VOCAB_TOTALS_CACHE[key] = (int(row.t_r), int(row.t_t))
    t_r, t_t = _VOCAB_TOTALS_CACHE[key]
    return vocab, t_r, t_t


@register("training_importance_selection", _IMPORTANCE_ORACLE)
def training_importance_selection(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    occ = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
        ).alias("tok"),
    )
    # ONE vocab table from ONE occurrence pass (r14): raw and target
    # counts were separate groupBys, each re-running the full
    # scan+explode (no cross-consumer CSE), and `totals` re-expanded
    # both AGAIN — five token passes per run in the before-plan
    # (plans/r14/training_importance_selection_before.txt). A
    # conditional count folds both dictionaries in one aggregation;
    # c_t is 0 (not NULL) for tokens with no target occurrences, which
    # the old left-join+coalesce produced identically. The dictionary
    # is materialized (rotated serialized checkpoint — vocabulary-
    # sized) so the totals aggregate and the broadcast probe read it
    # instead of re-deriving it; two token passes remain — the floor,
    # since the score needs corpus-wide counts before the per-doc sum.
    vocab, t_r, t_t = _importance_vocab(spark, sf_dir)
    # Dictionary join: vocabulary-sized side, broadcast (the 100 TB
    # fallback is AQE skew-join on the Zipf-heavy token key).
    doc_sums = (
        occ.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("c_t").cast("long").alias("num"),
            F.sum("c_r").cast("long").alias("den"),
        )
    )
    # Totals are TWO integers (driver arithmetic on a bounded table,
    # the temperature-mixture pattern): inlined as literals, so the
    # per-invocation totals aggregate + crossJoin broadcast are gone.
    scored = doc_sums.select(
        "doc_id",
        F.expr(
            f"CAST((CAST(num AS DECIMAL(38,0)) * {t_r} * {_SCALE})"
            f" DIV (CAST(den AS DECIMAL(38,0)) * {t_t}) AS BIGINT)"
        ).alias("score_ppm"),
    )
    return scored.orderBy(F.desc("score_ppm"), "doc_id").limit(_TOP_K)
