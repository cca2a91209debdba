"""Laws for bench.py's mover-verdict function (round-12 judge item 1).

Round 12 emitted five `confirmed_slower` verdicts against the r11
numbers, which predate the calibration job — all five were hypervisor
drift, adjudicated by the judge. The law: WITHOUT a previous-round
calibration anchor a mover verdict must be `no_anchor_inconclusive`,
never `confirmed_*`; WITH an anchor the verdict host-corrects against
the isolated child's own calibration. Pure-function tests — no Spark.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MOVER_RATIO, _mover_verdict


def test_no_anchor_is_inconclusive_even_for_huge_moves():
    # 3x slower in the isolated run, but no anchor: inconclusive.
    verdict, extras = _mover_verdict(
        prev=1.0, prev_host_scaled=1.0, iso=3.0, iso_cal=1.2, prev_cal=None
    )
    assert verdict == "no_anchor_inconclusive"
    assert "isolated_host_ratio" not in extras

    # Same for a huge speedup — no confirmed_faster without an anchor.
    verdict, _ = _mover_verdict(
        prev=3.0, prev_host_scaled=3.0, iso=1.0, iso_cal=1.2, prev_cal=None
    )
    assert verdict == "no_anchor_inconclusive"


def test_anchor_present_confirms_genuine_code_move():
    # Host speed identical across rounds (cal 1.0 -> 1.0); isolated
    # run is 2x the previous number: a real regression.
    verdict, extras = _mover_verdict(
        prev=1.0, prev_host_scaled=1.0, iso=2.0, iso_cal=1.0, prev_cal=1.0
    )
    assert verdict == "confirmed_slower"
    assert extras["isolated_host_ratio"] == 1.0

    verdict, _ = _mover_verdict(
        prev=2.0, prev_host_scaled=2.0, iso=1.0, iso_cal=1.0, prev_cal=1.0
    )
    assert verdict == "confirmed_faster"


def test_anchor_present_host_drift_corrected_to_noise():
    # The r12 failure shape: isolated run looks 1.5x slower, but the
    # child's calibration shows the host itself is 1.5x slower than
    # the anchor — host-corrected ratio is 1.0, so the verdict is
    # noise, not confirmed_slower.
    verdict, extras = _mover_verdict(
        prev=1.0, prev_host_scaled=1.5, iso=1.5, iso_cal=1.8, prev_cal=1.2
    )
    assert verdict == "noise"
    assert extras["isolated_host_ratio"] == 1.5
    assert abs(extras["isolated_vs_prev_ratio"] - 1.0) < 0.05


def test_anchor_present_child_cal_failed_falls_back_to_session_scale():
    # Child calibration failed (0.0): fall back to the session-scaled
    # previous number rather than crashing or mislabeling.
    verdict, extras = _mover_verdict(
        prev=1.0, prev_host_scaled=1.0, iso=2.0, iso_cal=0.0, prev_cal=1.0
    )
    assert verdict == "confirmed_slower"
    assert "isolated_host_ratio" not in extras


def test_verdict_boundary_tracks_mover_ratio_constant():
    # Just inside the band -> noise; just outside -> confirmed.
    inside = MOVER_RATIO - 0.01
    outside = MOVER_RATIO + 0.01
    v_in, _ = _mover_verdict(
        prev=1.0, prev_host_scaled=1.0, iso=inside, iso_cal=1.0, prev_cal=1.0
    )
    v_out, _ = _mover_verdict(
        prev=1.0, prev_host_scaled=1.0, iso=outside, iso_cal=1.0, prev_cal=1.0
    )
    assert v_in == "noise"
    assert v_out == "confirmed_slower"


# ---- r15: the isolated A/B protocol (r14 judge item 2) ----
# The r14 protocol compared cold-HEAD against the previous round's
# WARM-session archive and produced a provably false confirmed_slower
# (q1: 3.34x faster in-session). The A/B verdict compares two COLD
# legs run back-to-back — previous round's commit in a worktree vs
# HEAD — so cold-vs-warm bias cannot enter.

from bench import MOVER_MIN_DELTA, _ab_verdict, _prev_round_commit


def test_ab_equal_legs_is_noise():
    verdict, extras = _ab_verdict(
        iso_head=1.0, head_cal=1.0, iso_prev=1.0, prev_leg_cal=1.0
    )
    assert verdict == "noise"
    assert extras["ab_ratio"] == 1.0


def test_ab_confirms_real_regression_and_improvement():
    v, e = _ab_verdict(iso_head=2.0, head_cal=1.0, iso_prev=1.0, prev_leg_cal=1.0)
    assert v == "confirmed_slower" and e["ab_ratio"] == 2.0
    v, _ = _ab_verdict(iso_head=1.0, head_cal=1.0, iso_prev=2.0, prev_leg_cal=1.0)
    assert v == "confirmed_faster"


def test_ab_host_drift_between_legs_corrected():
    # HEAD leg ran on a 1.5x-slower host window than the prev leg:
    # raw 1.5x ratio is fully explained by the per-leg calibrations.
    v, e = _ab_verdict(iso_head=1.5, head_cal=1.8, iso_prev=1.0, prev_leg_cal=1.2)
    assert v == "noise"
    assert e["ab_host_ratio"] == 1.5
    assert abs(e["ab_ratio"] - 1.0) < 0.05


def test_ab_sub_delta_moves_are_noise():
    # Ratio beyond the band but absolute delta under MOVER_MIN_DELTA:
    # sub-0.2s queries flap on scheduler jitter, never confirm them.
    v, _ = _ab_verdict(
        iso_head=MOVER_MIN_DELTA * 0.9,
        head_cal=1.0,
        iso_prev=MOVER_MIN_DELTA * 0.3,
        prev_leg_cal=1.0,
    )
    assert v == "noise"


def test_ab_missing_calibration_still_compares_raw():
    # A failed calibration probe (0.0) on either leg: compare raw —
    # both legs are cold on the same host minutes apart, so raw is
    # still the least-biased available comparison.
    v, e = _ab_verdict(iso_head=2.0, head_cal=0.0, iso_prev=1.0, prev_leg_cal=1.2)
    assert v == "confirmed_slower"
    assert "ab_host_ratio" not in e


def test_prev_round_commit_resolves_in_this_repo():
    # The driver's "round N:" commit for the latest archived BENCH
    # round must resolve to a real sha (this repo carries r14's).
    sha = _prev_round_commit()
    import subprocess

    if (
        subprocess.run(
            ["git", "rev-parse", "--git-dir"], capture_output=True
        ).returncode
        != 0
    ):
        import pytest

        pytest.skip("not a git checkout")
    assert sha is not None and len(sha) == 40


def test_cleaner_leg_prefers_quieter_window():
    from bench import _cleaner_leg

    # lower calibration = quieter window wins, regardless of seconds
    assert _cleaner_leg((4.0, 2.8), (0.5, 1.3)) == (0.5, 1.3)
    assert _cleaner_leg((0.5, 1.3), (4.0, 2.8)) == (0.5, 1.3)
    # a failed-calibration leg loses to any calibrated leg
    assert _cleaner_leg((0.4, 0.0), (0.6, 1.2)) == (0.6, 1.2)
    # both failed: faster leg wins; None propagates
    assert _cleaner_leg((0.4, 0.0), (0.6, 0.0)) == (0.4, 0.0)
    assert _cleaner_leg(None, (0.6, 1.2)) == (0.6, 1.2)
    assert _cleaner_leg((0.6, 1.2), None) == (0.6, 1.2)
    assert _cleaner_leg(None, None) is None
