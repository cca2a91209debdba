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
