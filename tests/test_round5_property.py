"""Property-based checks of the round-5 operators against independent
pure-Python reference implementations on generated mini-corpora.

Each example writes the generated rows as parquet into a fresh tmp
sf-dir (the operators' contract is (spark, sf_dir)), runs the real
registered query, and compares the complete result multiset with a
from-scratch Python computation of the same definition — so the
Spark dataflow (explodes, joins, iteration chains) is validated
against the math, not against itself. Example counts are small:
every example pays a Spark job.
"""

from __future__ import annotations

import itertools
import os
from collections import Counter, defaultdict

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    from syllabus_sense_spark.session import get_spark

    return get_spark("round5-property")


def _write(tmp: str, name: str, df: pd.DataFrame) -> None:
    df.to_parquet(os.path.join(tmp, f"{name}.parquet"), index=False)


_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

_doc_texts = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=14),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(docs=_doc_texts)
def test_repeated_passages_matches_python(docs):
    import tempfile

    from syllabus_sense_spark.queries.ext_text5 import _N, dedup_repeated_passages

    spark = _spark()
    with tempfile.TemporaryDirectory(prefix="sfprop_") as tmp:
        _write(
            tmp,
            "documents",
            pd.DataFrame(
                {
                    "doc_id": range(1, len(docs) + 1),
                    "text": [" ".join(ws) for ws in docs],
                }
            ),
        )
        got = {
            (r.doc_id, r.n_grams, r.n_repeated, r.rep_ppm)
            for r in dedup_repeated_passages(spark, tmp).collect()
        }

    # reference: positional word n-grams, repeated = in >= 2 docs
    grams_by_doc: dict[int, list[tuple[str, ...]]] = {}
    for i, ws in enumerate(docs, start=1):
        grams_by_doc[i] = [
            tuple(ws[j : j + _N]) for j in range(len(ws) - _N + 1)
        ]
    docs_per_gram: dict[tuple[str, ...], set[int]] = defaultdict(set)
    for d, gs in grams_by_doc.items():
        for g in gs:
            docs_per_gram[g].add(d)
    expect = set()
    for d, gs in grams_by_doc.items():
        n_rep = sum(1 for g in gs if len(docs_per_gram[g]) >= 2)
        if n_rep > 0:
            expect.add((d, len(gs), n_rep, n_rep * 1_000_000 // len(gs)))
    assert got == expect


_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),  # orderkey
        st.integers(min_value=1, max_value=5),  # custkey
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)
_lines = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),  # orderkey
        st.integers(min_value=1, max_value=4),  # suppkey
        st.integers(min_value=1, max_value=6),  # partkey
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(orders=_orders, lines=_lines)
def test_integer_pagerank_matches_python(orders, lines):
    import tempfile

    from syllabus_sense_spark.queries.ext_graph2 import (
        _ITER,
        _SUPP_OFFSET,
        graph_pagerank_trade,
    )

    spark = _spark()
    with tempfile.TemporaryDirectory(prefix="sfprop_") as tmp:
        _write(
            tmp,
            "orders",
            pd.DataFrame(orders, columns=["o_orderkey", "o_custkey"]),
        )
        _write(
            tmp,
            "lineitem",
            pd.DataFrame(lines, columns=["l_orderkey", "l_suppkey", "l_partkey"]),
        )
        got = {
            (r.node, r.rank_micro)
            for r in graph_pagerank_trade(spark, tmp).collect()
        }

    # reference: exact integer PageRank over the undirected bipartite
    # projection of the joined trade pairs
    okey_to_cust = dict(orders)
    pairs = {
        (okey_to_cust[ok], sk)
        for (ok, sk, _pk) in lines
        if ok in okey_to_cust
    }
    und = defaultdict(set)
    for c, s in pairs:
        und[c].add(_SUPP_OFFSET + s)
        und[_SUPP_OFFSET + s].add(c)
    # out-degree counts parallel edges once (pairs are distinct)
    out = {n: len(tgts) for n, tgts in und.items()}
    r = {n: 1_000_000 for n in und}
    for _ in range(_ITER):
        nxt = {n: 150_000 for n in und}
        for u, tgts in und.items():
            share = (r[u] * 17) // (20 * out[u])
            for v in tgts:
                nxt[v] += share
        r = nxt
    assert got == set(r.items())


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(lines=_lines)
def test_triangle_census_matches_python(lines):
    import tempfile

    from syllabus_sense_spark.queries.ext_graph3 import (
        _MIN_SUPPORT,
        graph_triangle_census,
    )

    spark = _spark()
    with tempfile.TemporaryDirectory(prefix="sfprop_") as tmp:
        _write(
            tmp,
            "lineitem",
            pd.DataFrame(lines, columns=["l_orderkey", "l_suppkey", "l_partkey"]),
        )
        got = {
            (r.part_key, r.n_triangles)
            for r in graph_triangle_census(spark, tmp).collect()
        }

    items = {(ok, pk) for (ok, _sk, pk) in lines}
    support = Counter()
    by_order = defaultdict(set)
    for ok, pk in items:
        by_order[ok].add(pk)
    for parts in by_order.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            support[(a, b)] += 1
    edges = {e for e, n in support.items() if n >= _MIN_SUPPORT}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    per_node = Counter()
    for a, b in edges:
        for c in adj[b]:
            if (a, c) in edges:
                for n in (a, b, c):
                    per_node[n] += 1
    assert got == set(per_node.items())
