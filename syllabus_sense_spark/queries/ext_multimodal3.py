"""[EXT] Multimodal, part 3: perceptual-hash (dHash) image dedup —
the image-side twin of the text near-dup ladder, computed from REAL
decoded bytes (the ext_multimodal2 BMP container path) and certified
by a DuckDB oracle that recomputes the hash relationally from the
pixel formula, so a hash match proves container parse + pixel decode
+ grayscale + grid sampling + bit packing, end to end.

Integer dHash, no resize interpolation (the float step of classic
dHash is replaced by deterministic integer grid sampling so the value
is engine-exact):

- sample a 9-wide x 7-tall grid: x_k = (k*w) DIV 9, y_j = (j*h) DIV 7
  (always in range: k <= 8 -> x_k <= 8w/9 < w);
- integer grayscale g = 299*R + 587*G + 114*B (the BT.601 weights in
  milli-units — no division, order-preserving);
- bit (j*8 + k) set iff g(x_{k+1}, y_j) > g(x_k, y_j): 8 horizontal
  comparisons per row x 7 rows = a 56-bit hash, nonnegative in a
  signed BIGINT.

``multimodal_phash_dedup``: per image (doc_id, width, height, phash).
``multimodal_phash_groups``: hash buckets with >= 2 images — the
dedup candidate groups. Identical gradient images (same dims and same
pixel residues) collide exactly; near-identical ones differ in a few
bits and would be banded like SimHash (dedup_simhash.py's 7-bit-band
equi-join is the scale recipe; this query certifies the hash).

Scale posture: decode + hash is a map (mapInPandas over the binary
column, O(1) output per image); grouping is a 56-bit-key hash
aggregate. Nothing pairwise, no shuffle of pixel data — only hashes
move. Reference anchor: none ([EXT] per SURVEY.md §2 — multimodal
columns; method: classic dHash, public).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load
from . import register
from .ext_multimodal2 import (
    BMP_BLOB_SCHEMA,
    WAV_BLOB_SCHEMA,
    _BLUE,
    _GREEN,
    _H,
    _RED,
    _W,
    decode_bmp_pixels,
    encode_bmp_blobs,
    encode_wav_blobs,
)

_GRID_W = 9
_GRID_H = 7

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def _dhash(w: int, h: int, px: np.ndarray) -> int:
    """56-bit integer dHash of an RGB pixel array (top-down)."""
    xs = (np.arange(_GRID_W, dtype=np.int64) * w) // _GRID_W
    ys = (np.arange(_GRID_H, dtype=np.int64) * h) // _GRID_H
    p = px[np.ix_(ys, xs)].astype(np.int64)  # (7, 9, 3)
    gray = 299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]
    bits = gray[:, 1:] > gray[:, :-1]  # (7, 8)
    weights = 1 << (
        np.arange(_GRID_H, dtype=np.int64)[:, None] * 8
        + np.arange(_GRID_W - 1, dtype=np.int64)[None, :]
    )
    return int((bits * weights).sum())


def bmp_phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        recs = []
        for did, payload in zip(pdf["doc_id"], pdf["bmp"]):
            dec = decode_bmp_pixels(payload)
            if dec is None:
                recs.append((int(did), None, None, None))
                continue
            w, h, px = dec
            recs.append((int(did), w, h, _dhash(w, h, px)))
        yield pd.DataFrame(
            recs, columns=[f.name for f in PHASH_SCHEMA.fields]
        ).astype({"doc_id": "int64"})


# The oracle recomputes the hash from the pixel FORMULA — sampling the
# same integer grid, so it agrees with the byte-path value exactly.
_PHASH_CTE = f"""
dims AS (
  SELECT doc_id, {_W} AS w, {_H} AS h FROM documents
),
grid AS (
  SELECT d.doc_id, d.w, d.h, j.j, k.k,
         (k.k * d.w) // {_GRID_W} AS x,
         (j.j * d.h) // {_GRID_H} AS y
  FROM dims d, UNNEST(range({_GRID_W})) AS k(k),
               UNNEST(range({_GRID_H})) AS j(j)
),
gray AS (
  SELECT doc_id, w, h, j, k,
         299 * ({_RED.replace('doc_id', 'grid.doc_id')})
         + 587 * ({_GREEN.replace('doc_id', 'grid.doc_id')})
         + 114 * ({_BLUE.replace('doc_id', 'grid.doc_id')}) AS g
  FROM grid
),
hashed AS (
  SELECT a.doc_id,
         CAST(MAX(a.w) AS BIGINT) AS width,
         CAST(MAX(a.h) AS BIGINT) AS height,
         CAST(SUM(CASE WHEN b.g > a.g
                       THEN CAST(1 AS BIGINT) << (a.j * 8 + a.k)
                       ELSE 0 END) AS BIGINT) AS phash
  FROM gray a
  JOIN gray b ON b.doc_id = a.doc_id AND b.j = a.j AND b.k = a.k + 1
  GROUP BY a.doc_id
)
"""

_PHASH_ORACLE = f"WITH {_PHASH_CTE} SELECT doc_id, width, height, phash FROM hashed"


@register("multimodal_phash_dedup", _PHASH_ORACLE)
def multimodal_phash_dedup(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id")
    blobs = d.mapInPandas(encode_bmp_blobs, BMP_BLOB_SCHEMA)
    return blobs.mapInPandas(bmp_phash, PHASH_SCHEMA)


_PHASH_GROUPS_ORACLE = f"""
WITH {_PHASH_CTE}
SELECT phash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
FROM hashed
GROUP BY phash
HAVING COUNT(*) >= 2
"""


@register("multimodal_phash_groups", _PHASH_GROUPS_ORACLE)
def multimodal_phash_groups(spark, sf_dir):
    return (
        multimodal_phash_dedup(spark, sf_dir)
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# audio fingerprint (dHash analog over decoded PCM samples)

_AFP_POINTS = 57  # 56 sign-of-delta bits, nonnegative in a signed BIGINT

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("afp", T.LongType(), True),
    ]
)


def _audio_fp(s: np.ndarray) -> int:
    """56-bit sign-of-delta fingerprint over an integer sample grid —
    the audio analog of the image dHash: deterministic integer grid
    (k*n DIV 57), bit k set iff s[g_{k+1}] > s[g_k]. No resampling
    filter, no float — engine-exact."""
    n = len(s)
    g = (np.arange(_AFP_POINTS, dtype=np.int64) * n) // _AFP_POINTS
    v = s[g].astype(np.int64)
    bits = v[1:] > v[:-1]
    return int((bits * (1 << np.arange(_AFP_POINTS - 1, dtype=np.int64))).sum())


def wav_fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .ext_multimodal2 import decode_wav_samples

    for pdf in batches:
        recs = []
        for did, payload in zip(pdf["doc_id"], pdf["wav"]):
            s = decode_wav_samples(payload)
            if s is None or len(s) < _AFP_POINTS:
                recs.append((int(did), None, None))
                continue
            recs.append((int(did), len(s), _audio_fp(s)))
        yield pd.DataFrame(
            recs, columns=[f.name for f in AUDIO_FP_SCHEMA.fields]
        ).astype({"doc_id": "int64"})


# The oracle replays the sample formula s(i) = (doc_id*31 + i*17) %
# 65536 - 32768 with n = 64 + doc_id % 64 samples (ext_multimodal2's
# generator), samples the same integer grid, and packs the same bits.
_AUDIO_FP_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
),
grid AS (
  SELECT d.doc_id, d.n, k.k,
         (k.k * d.n) // {_AFP_POINTS} AS i
  FROM dims d, UNNEST(range({_AFP_POINTS})) AS k(k)
),
vals AS (
  SELECT doc_id, n, k,
         (doc_id * 31 + i * 17) % 65536 - 32768 AS v
  FROM grid
),
packed AS (
  SELECT a.doc_id,
         CAST(MAX(a.n) AS BIGINT) AS n_samples,
         CAST(SUM(CASE WHEN b.v > a.v
                       THEN CAST(1 AS BIGINT) << a.k ELSE 0 END) AS BIGINT)
           AS afp
  FROM vals a JOIN vals b ON b.doc_id = a.doc_id AND b.k = a.k + 1
  GROUP BY a.doc_id
)
SELECT doc_id, n_samples, afp FROM packed
"""


@register("multimodal_audio_fingerprint", _AUDIO_FP_ORACLE)
def multimodal_audio_fingerprint(spark, sf_dir):
    """Audio dedup fingerprint over REAL decoded PCM bytes (RIFF chunk
    walk → int16 samples → integer-grid sign-of-delta hash); the
    oracle recomputes it from the generating formula, so hash green
    certifies the container walk + endianness + grid + packing.
    Same map-only scale posture as multimodal_phash_dedup."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    blobs = d.mapInPandas(encode_wav_blobs, WAV_BLOB_SCHEMA)
    return blobs.mapInPandas(wav_fingerprint, AUDIO_FP_SCHEMA)


# ---------------------------------------------------------------------------
# banded near-match over the image hashes (the SimHash recipe applied
# to the perceptual hash): candidates from 8-bit band agreement over
# the DISTINCT hash table, verified by exact Hamming distance

_PHASH_BANDS = 7  # 56 bits / 8-bit bands
_PHASH_HAMMING_MAX = 6


@register(
    "multimodal_phash_near_pairs",
    f"""
WITH {_PHASH_CTE},
hv AS (
  SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM hashed GROUP BY phash
),
banded AS (
  SELECT phash, n_docs, b.b AS band_idx,
         (phash >> (8 * b.b)) & 255 AS band_v
  FROM hv, UNNEST(range({_PHASH_BANDS})) AS b(b)
),
cand AS (
  SELECT DISTINCT a.phash AS ph_a, a.n_docs AS n_docs_a,
                  c.phash AS ph_b, c.n_docs AS n_docs_b
  FROM banded a
  JOIN banded c ON c.band_idx = a.band_idx AND c.band_v = a.band_v
               AND c.phash > a.phash
)
SELECT ph_a, ph_b, n_docs_a, n_docs_b,
       CAST(bit_count(CAST(xor(ph_a, ph_b) AS BIGINT)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(CAST(xor(ph_a, ph_b) AS BIGINT)) <= {_PHASH_HAMMING_MAX}
""",
)
def multimodal_phash_near_pairs(spark, sf_dir):
    """NEAR-duplicate image groups: the SimHash banding recipe over
    the 56-bit perceptual hash, at HASH granularity — exact-duplicate
    images already collapse into one hash bucket
    (multimodal_phash_groups), so near-match candidates are generated
    over the DISTINCT hash table (844 hashes for 5000 images at
    sf0.1), never over documents: a pair within Hamming <= 6 must
    agree exactly on one of the 7 8-bit bands (pigeonhole), the band
    equi-join proposes it, and only candidates pay the bit_count
    verify. Each output row carries both buckets' doc counts, so
    doc-level near-dup mass is readable without materializing the
    quadratic doc-pair expansion — the same dedup-ladder shape as
    dedup_simhash (distinct-fingerprint candidates, counts carried)."""
    ph = (
        multimodal_phash_dedup(spark, sf_dir)
        .groupBy("phash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    banded = ph.select(
        "phash",
        "n_docs",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_PHASH_BANDS - 1}),"
                f" b -> struct(b AS band_idx,"
                f" shiftright(phash, 8 * b) & 255 AS band_v))"
            )
        ).alias("band"),
    ).select("phash", "n_docs", "band.band_idx", "band.band_v")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_v") == F.col("b.band_v"))
            & (F.col("b.phash") > F.col("a.phash")),
        )
        .select(
            F.col("a.phash").alias("ph_a"),
            F.col("a.n_docs").alias("n_docs_a"),
            F.col("b.phash").alias("ph_b"),
            F.col("b.n_docs").alias("n_docs_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(ph_a ^ ph_b)").cast("bigint")
    return cand.select(
        "ph_a", "ph_b", "n_docs_a", "n_docs_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= _PHASH_HAMMING_MAX)
