"""[EXT] Temperature-scaled mixture sampling — the data-mixing step
of LLM pretraining (sample source i with probability ∝ massᵢ^T,
T = 0.5, the "square-root temperature" that up-weights small sources;
the multilingual-sampling trick from the XLM-R / mT5 line of work).

Complements `mixture_resample_to_target` (ext_training2.py): that one
resamples toward a *uniform* mixture under a token budget; this one
implements the *temperature* family — the recipe is a parameterized
weight exponent, and the two ship as the two standard presets (T=1
uniform-target vs T=0.5 flattened-proportional).

Deterministic end-to-end, which is the hard part: a production
sampler must produce the *same* subset on re-run (resumable jobs,
reproducible ablations), so nothing here uses engine RNG.

1. source mass = Σ n_chars per source (exact BIGINT);
2. weight = ⌊√mass⌋ — the only float op, a single correctly-rounded
   IEEE sqrt on an exact integer, bit-identical in any engine;
3. per-source acceptance rate in ppm by *integer* division:
   rate = min(1e6, target · weight · 1e6 DIV (Σweights · count));
4. per-doc accept test: (doc_id · 2654435761) mod 1e6 < rate — a
   Knuth multiplicative hash on the stable doc_id, so membership is a
   pure function of (doc_id, per-source rate), not of partitioning.

Output = the per-source audit table (docs, mass, weight, rate,
sampled count) — what a mixing job logs to prove the realized mixture
matches the recipe. Everything BIGINT.

Scale posture: stage 1 is one groupBy(source) partial-agg; stages
2-3 are arithmetic on a source-count-sized table (broadcast back);
stage 4 is a broadcast join + filter + one more groupBy(source).
Two scans of documents metadata columns (never the text), no skew
risk beyond source imbalance itself — which this operator exists to
correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_TARGET_DIV = 2  # sample target = half the corpus
_KNUTH = 2654435761

_MIXTURE_ORACLE = f"""
WITH stats AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS mass
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, mass,
         CAST(FLOOR(SQRT(mass)) AS BIGINT) AS weight
  FROM stats
),
tot AS (
  SELECT CAST(SUM(weight) AS BIGINT) AS tot_w,
         CAST(SUM(n_docs) AS BIGINT) // {_TARGET_DIV} AS target
  FROM w
),
rates AS (
  SELECT w.source, w.n_docs, w.mass, w.weight,
         LEAST(1000000,
               (tot.target * w.weight * 1000000) // (tot.tot_w * w.n_docs))
           AS rate_ppm
  FROM w, tot
),
picks AS (
  SELECT d.source, COUNT(*) AS n_sampled
  FROM documents d JOIN rates r ON r.source = d.source
  WHERE (d.doc_id * {_KNUTH}) % 1000000 < r.rate_ppm
  GROUP BY d.source
)
SELECT r.source, r.n_docs, r.mass, r.weight, r.rate_ppm,
       COALESCE(p.n_sampled, 0) AS n_sampled
FROM rates r LEFT JOIN picks p ON p.source = r.source
"""


@register("training_temperature_mixture", _MIXTURE_ORACLE)
def training_temperature_mixture(spark, sf_dir):
    # TWO scans of documents — the floor (the rate needs corpus-wide
    # stats before the accept test) — instead of the before-plan's
    # four: `stats` fed three lazy consumers (tot, rates, the final
    # join) and each reference re-ran the scan+groupBy (no
    # cross-consumer CSE). The stats table is source-count-sized —
    # the same bounded-metadata class as the IVF centroid tables — so
    # stages 2-3 (weight, totals, rates) are exact integer/IEEE-sqrt
    # arithmetic on a handful of rows, done driver-side: Python ints
    # are arbitrary-precision (⊇ the BIGINT lane), `//` on
    # non-negative ints is the truncating DIV both engines use, and
    # math.sqrt is the same correctly-rounded IEEE double as
    # java.lang.Math.sqrt.
    import math

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    stats = sorted(
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("mass"),
        )
        .collect()
    )
    out_schema = (
        "source string, n_docs long, mass long, weight long, rate_ppm long"
    )
    if not stats:
        rates = spark.createDataFrame([], out_schema)
    else:
        weights = [int(math.floor(math.sqrt(r.mass))) for r in stats]
        tot_w = sum(weights)
        target = sum(r.n_docs for r in stats) // _TARGET_DIV
        rates = spark.createDataFrame(
            [
                (
                    r.source,
                    r.n_docs,
                    r.mass,
                    wt,
                    min(1_000_000, (target * wt * 1_000_000) // (tot_w * r.n_docs)),
                )
                for r, wt in zip(stats, weights)
            ],
            out_schema,
        )
    # One distributed pass for the accept test: the audit columns ride
    # the broadcast rates row, and the per-doc accept predicate folds
    # into a CONDITIONAL count in the same groupBy — no second join,
    # and no broadcast whose build side is itself an aggregation job
    # (the former left-join shape serialized the whole picks subjob
    # behind a driver collect before a 20-row join could run). Sources
    # with zero accepted docs still group (every rates source has
    # ≥1 document by construction — stats came from documents), so the
    # conditional sum reproduces COALESCE(n_sampled, 0) exactly.
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "mass", "weight", "rate_ppm")
        .agg(
            F.sum(
                F.when(
                    F.expr(f"(doc_id * {_KNUTH}) % 1000000")
                    < F.col("rate_ppm"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_sampled")
        )
    )
