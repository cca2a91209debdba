"""Execution smoke over the ENTIRE query registry at sf0.001: every
registered query must build and run to a noop sink.

This is the per-commit guard for the failure class the round-3 bench
crash exposed — a shared-path change (tables.py, _util, session conf)
silently breaking a query that no focused unit test touches. The
sf0.01 oracle gate catches it too, but only when run; this keeps the
whole registry executable inside `pytest tests/`.

Streaming drains and other eager queries run their jobs during
construction — included deliberately (they are exactly the queries a
shared-path change breaks). Budget: ~2-3 min for ~186 queries at
sf0.001.
"""

from __future__ import annotations

import pytest


def test_every_registered_query_executes(spark, sf_dir):
    from syllabus_sense_spark import queries as q

    q.load_all_queries()
    failures: list[str] = []
    for name, fn in q.QUERIES.items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:160]}")
    if failures:
        pytest.fail(
            f"{len(failures)}/{len(q.QUERIES)} queries failed to execute:\n"
            + "\n".join(failures)
        )
