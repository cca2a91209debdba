"""Laws for bench.py's committed per-round history (round-13 judge
item 2).

BENCH_r13 ran with ``movers_basis: "none"`` — the driver archives only
a 2000-char stdout TAIL of each bench run, r12's tail was consumed by
its movers block, and a 5× mover (`graph_bfs_levels`) went through
with no round-over-round comparison at all. The law: bench.py persists
its FULL payload to ``tools/bench_history/r{N}.json`` at the end of
every run, and the previous-round readers (`_prev_bench_queries`,
`_prev_calibration`) prefer that file over the lossy tail. Pure
filesystem tests — no Spark.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    _latest_bench_round,
    _prev_bench_queries,
    _prev_calibration,
    _prev_history,
    _write_history,
)


def _fake_archive(tmp_path, rnd: int, tail: str) -> None:
    (tmp_path / f"BENCH_r{rnd}.json").write_text(
        json.dumps({"n": rnd, "tail": tail, "parsed": None})
    )


def test_write_history_lands_at_latest_round_plus_one(tmp_path):
    here = str(tmp_path)
    _fake_archive(tmp_path, 5, "")
    path = _write_history({"queries": {"q1": 1.0}, "calibration_sec": 1.1}, here)
    assert path.endswith(os.path.join("tools", "bench_history", "r6.json"))
    assert json.load(open(path))["queries"] == {"q1": 1.0}
    # re-run within the same round overwrites, never duplicates
    _write_history({"queries": {"q1": 2.0}, "calibration_sec": 1.2}, here)
    assert json.load(open(path))["queries"] == {"q1": 2.0}


def test_prev_readers_prefer_history_over_tail(tmp_path):
    here = str(tmp_path)
    # The archive tail carries DIFFERENT (truncation-shaped) numbers
    # than the full history file; the readers must pick the history.
    _fake_archive(
        tmp_path, 7, '"execute": {"q1": 9.9}, "calibration_sec": 9.9}'
    )
    os.makedirs(tmp_path / "tools" / "bench_history")
    (tmp_path / "tools" / "bench_history" / "r7.json").write_text(
        json.dumps(
            {
                "queries": {"q1": 1.5, "q2": 0.5},
                "execute": {"q1": 1.2, "q2": 0.4},
                "calibration_sec": 1.3,
            }
        )
    )
    q, kind = _prev_bench_queries(here)
    assert kind == "queries"
    assert q == {"q1": 1.5, "q2": 0.5}
    assert _prev_calibration(here) == 1.3


def test_history_with_only_execute_half_reports_execute_kind(tmp_path):
    # The seeded r13 file: the tail-truncated 'queries' dict is absent,
    # only the complete 'execute' half is recorded.
    here = str(tmp_path)
    _fake_archive(tmp_path, 13, "")
    os.makedirs(tmp_path / "tools" / "bench_history")
    (tmp_path / "tools" / "bench_history" / "r13.json").write_text(
        json.dumps({"execute": {"q1": 4.3}, "calibration_sec": 1.207})
    )
    q, kind = _prev_bench_queries(here)
    assert kind == "execute"
    assert q == {"q1": 4.3}
    assert _prev_calibration(here) == 1.207


def test_missing_history_falls_back_to_tail_execute(tmp_path):
    here = str(tmp_path)
    _fake_archive(
        tmp_path,
        4,
        'truncated... "execute": {"q1": 0.8, "q2": 0.2}, '
        '"host_speed_vs_prev": 1.0, "calibration_sec": 1.4}',
    )
    assert _prev_history(here) is None
    q, kind = _prev_bench_queries(here)
    assert kind == "execute"
    assert q == {"q1": 0.8, "q2": 0.2}
    assert _prev_calibration(here) == 1.4


def test_round_one_has_no_basis(tmp_path):
    here = str(tmp_path)
    assert _latest_bench_round(here) == 0
    assert _prev_history(here) is None
    assert _prev_bench_queries(here) == ({}, "none")
    assert _prev_calibration(here) is None


def test_repo_seeded_r13_history_is_readable():
    """The committed seed: real r13 numbers recovered from the archive
    tail, so BENCH_r14 compares against a real basis."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist = _prev_history(here)
    if hist is None or _latest_bench_round(here) != 13:
        return  # future rounds rotate the archive; the law above still holds
    assert hist["execute"]["graph_bfs_levels"] == 4.306
    assert hist["calibration_sec"] == 1.207
