"""scratch_dir crash-debris sweep laws (round-11 ADVICE closure).

The sweep must key owner liveness on (pid, kernel start time), not pid
alone: a dead sibling root whose pid was recycled by an unrelated live
process is still debris and must be deleted. Init must be
single-sweep under thread races.
"""

from __future__ import annotations

import os
import tempfile
import threading

import syllabus_sense_spark.queries._util as u


def _fresh(monkeypatch, tmp_path):
    """Point the sweeper at an isolated temp base with empty memo."""
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(u, "_SCRATCH_ROOT", [])


def test_proc_start_token_self_and_dead():
    me = u._proc_start_token(os.getpid())
    assert me is not None and me.isdigit()
    # pid 0 has no /proc entry
    assert u._proc_start_token(0) is None


def test_sweep_removes_dead_and_recycled_keeps_live(monkeypatch, tmp_path):
    _fresh(monkeypatch, tmp_path)
    live_tok = u._proc_start_token(os.getpid())
    # dead owner: a pid far above pid_max never runs
    dead = tmp_path / "sss-scratch-999999999-123"
    # recycled pid: OUR live pid but a token that is not ours
    recycled = tmp_path / f"sss-scratch-{os.getpid()}-1"
    # genuinely live owner (this process, correct token)
    live = tmp_path / f"sss-scratch-{os.getpid()}-{live_tok}"
    # legacy (pre-token) name with a live pid: left alone
    legacy_live = tmp_path / f"sss-scratch-{os.getpid()}"
    # legacy name with a dead pid: swept via the os.kill fallback
    legacy_dead = tmp_path / "sss-scratch-999999998"
    for d in (dead, recycled, live, legacy_live, legacy_dead):
        d.mkdir()
    u.scratch_dir("t")
    assert not dead.exists(), "dead owner's root survived the sweep"
    assert not recycled.exists(), (
        "recycled-pid root survived: liveness keyed on pid alone"
    )
    assert live.exists(), "live owner's root was swept"
    assert legacy_live.exists(), "legacy-name live root was swept"
    assert not legacy_dead.exists(), "legacy-name dead root survived"


def test_init_is_single_sweep_under_thread_race(monkeypatch, tmp_path):
    _fresh(monkeypatch, tmp_path)
    results: list[str] = []
    errors: list[BaseException] = []

    def call():
        try:
            results.append(u.scratch_dir("race"))
        except BaseException as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=call) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 8 and len(set(results)) == 8
    # exactly one root registered, and every dir lives under it
    assert len(u._SCRATCH_ROOT) == 1
    root = u._SCRATCH_ROOT[0]
    assert all(r.startswith(root + os.sep) for r in results)
