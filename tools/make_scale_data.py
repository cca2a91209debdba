"""Deterministic scale-up of the harness tables for scaling probes.

Tiles `/root/testdata/sf0.1` by an integer factor K (K=3 -> "sf0.3",
K=10 -> "sf1") with foreign-key-consistent key offsets, so every join
in the registry stays valid and every per-key series keeps its shape —
the data grows in the ENTITY dimension (more customers, orders, users,
documents), which is how a production corpus actually scales.

Per replica i in 0..K-1:
- every key column (orderkey, custkey, partkey, suppkey, doc_id,
  vec_id, event_id, user_id) shifts by i * 10_000_000 — far above any
  real key and above derived-id spaces (the dedup corpus synthesizes
  doc_id + 2_000_000 twins in-query);
- nationkeys / timestamps / values are unchanged (fixed dims stay
  fixed; group-key cardinality for entity keys grows K-fold, for
  categorical keys stays flat — both realistic);
- documents.text in replicas i>0 has every 4th word replaced by a
  replica-tagged token: at 3-gram shingling only 1 in 4 shingles
  survives (Jaccard ~0.14 vs originals), so replicas are NOT
  near-duplicates of each other and the dedup ladder's candidate
  generation scales on real structure, not K² artifacts; within a
  replica the original near-dup structure is preserved untouched;
- embeddings.embedding gets a cyclic dimension shift by i (norms and
  intra-replica geometry preserved; cross-replica vectors land
  elsewhere in the space, so ANN cell occupancy grows K-fold instead
  of stacking K duplicates per cell);
- region / nation copy through unchanged.

Everything is a pure function of the input and the replica index — no
RNG — so repeated runs are bit-identical.

Usage: python tools/make_scale_data.py K OUTDIR [SRCDIR]
  e.g. python tools/make_scale_data.py 10 /tmp/scale_data/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OFFSET = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_THROUGH = ["region", "nation"]


def _perturb_text(texts: pa.ChunkedArray, i: int) -> pa.Array:
    out = []
    for t in texts.to_pylist():
        words = t.split(" ")
        out.append(
            " ".join(
                f"r{i}w{j}" if j % 4 == 0 else w
                for j, w in enumerate(words)
            )
        )
    return pa.array(out, type=pa.string())


def _shift_embeddings(col: pa.ChunkedArray, i: int) -> pa.Array:
    vecs = [np.asarray(v, dtype=np.float32) for v in col.to_pylist()]
    if i:
        vecs = [np.roll(v, i % len(v)) for v in vecs]
    return pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32()))


def _write(table: pa.Table, path: str) -> None:
    """Bounded row groups (~32 per table, min 2000 rows): a parquet
    file is only scan-parallel at row-group granularity, and the
    harness fixtures ship ONE group per file — so every pure map over
    the tiled corpus ran on 1-2 cores of 32 regardless of
    maxPartitionBytes (r10 sweep: 8-11x/decade on linear per-row work
    that is embarrassingly parallel in production, where files are
    written with exactly this row-group discipline). Deterministic:
    the split points are a pure function of row count."""
    rows_per_group = max(2000, table.num_rows // 32)
    pq.write_table(table, path, row_group_size=rows_per_group)


def scale_table(name: str, src: str, out: str, k: int) -> int:
    table = pq.read_table(os.path.join(src, f"{name}.parquet"))
    if name in COPY_THROUGH or k == 1:
        _write(table, os.path.join(out, f"{name}.parquet"))
        return table.num_rows
    replicas = []
    for i in range(k):
        t = table
        for key in KEY_COLS.get(name, ()):
            idx = t.schema.get_field_index(key)
            shifted = pa.compute.add(t.column(key), OFFSET * i)
            t = t.set_column(idx, key, shifted.cast(t.schema.field(key).type))
        if name == "documents" and i:
            idx = t.schema.get_field_index("text")
            t = t.set_column(idx, "text", _perturb_text(t.column("text"), i))
        if name == "embeddings":
            idx = t.schema.get_field_index("embedding")
            emb_type = t.schema.field("embedding").type
            t = t.set_column(
                idx,
                "embedding",
                _shift_embeddings(t.column("embedding"), i).cast(emb_type),
            )
        replicas.append(t)
    combined = pa.concat_tables(replicas)
    _write(combined, os.path.join(out, f"{name}.parquet"))
    return combined.num_rows


def main() -> None:
    k = int(sys.argv[1])
    out = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    for name in COPY_THROUGH + list(KEY_COLS):
        rows = scale_table(name, src, out, k)
        print(f"{name}: {rows} rows")


if __name__ == "__main__":
    main()
