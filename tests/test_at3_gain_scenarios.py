"""Gain-control scenario suite: wire-point identity against the reference.

tests/golden/gain_scenarios.json pins, per (frame, channel, band), the
reference encoder's gain decisions over a transient battery — skip
classification, sticky-frame eligibility, point0-guard verdicts, and the
final wire curve points — extracted from its --yaml-log stream by
tools/gen_gain_scenarios.py.  This is the table-driven analog of the
reference's gain_processor_ut.cpp/transient scenario suites
(src/transient_detector.cpp:276-482, atrac3denc.cpp:299-579): any change to
the plateau / sticky / release / point0 machinery shifts these points.
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "gain_scenarios.json")


def stimulus():
    """Deterministic transient battery; returns (int16 [2, T], float32
    [2, T] = int16/32768 — the bit-exact domain both encoders read)."""
    rng = np.random.default_rng(42)
    t = 1024 * 48
    sig = np.zeros(t, np.float64)
    n = np.arange(t)
    sig += 0.02 * np.sin(2 * np.pi * 440 * n / 44100)
    events = [(3000, 0.7, 300), (9000, 0.5, 2000), (14000, 0.9, 100),
              (14500, 0.8, 100), (20000, 0.3, 5000), (30000, 0.95, 50),
              (33000, 0.6, 900), (40000, 0.4, 4000), (41000, 0.85, 60)]
    for start, amp, dec in events:
        ln = min(dec * 6, t - start)
        env = np.exp(-np.arange(ln) / dec)
        sig[start:start + ln] += amp * env * rng.standard_normal(ln) * 0.5
        sig[start:start + ln] += (amp * env
                                  * np.sin(2 * np.pi * 7000
                                           * np.arange(ln) / 44100) * 0.5)
    sig = np.clip(sig, -0.98, 0.98)
    pcm = np.stack([sig, np.roll(sig, 777) * 0.75])
    ints = np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16)
    return ints, ints.astype(np.float32) / 32768.0


@pytest.fixture(scope="module")
def our_planes():
    from atracdenc_tpu.models.atrac3.encoder import encode_track
    _, f32 = stimulus()
    return encode_track(f32, frame_bytes=384, js=False,
                        no_gain_control=False, no_tonal=True)


@pytest.fixture(scope="module")
def scenarios():
    data = json.load(open(GOLDEN))
    return data


def test_scenario_coverage(scenarios):
    """The battery must actually exercise the machinery (>= 30 non-trivial
    scenarios spanning the major classes)."""
    cls = scenarios["classes"]
    assert cls.get("has_points", 0) >= 30
    assert cls.get("sticky", 0) >= 5
    assert "point0:kept" in cls
    assert cls.get("skip:low_hfr", 0) > 0
    assert cls.get("skip:no_curve", 0) > 0


def test_wire_points_match_reference(scenarios, our_planes):
    """Final gain points (the wire-visible outcome of plateau / sticky /
    release / point0) must match the reference on every scenario; residual
    float-knife-edge divergences are bounded to < 2% of point-bearing
    records and reported."""
    npts = np.asarray(our_planes["gain_npoints"])
    levels = np.asarray(our_planes["gain_levels"])
    locs = np.asarray(our_planes["gain_locs"])

    total = with_points = mismatches = 0
    bad = []
    for r in scenarios["records"]:
        fi, ch, b = r["frame"], r["ch"], r["band"]
        ours = [[int(levels[ch, fi, b, p]), int(locs[ch, fi, b, p])]
                for p in range(int(npts[ch, fi, b]))]
        total += 1
        if r["points"] or ours:
            with_points += 1
            if ours != r["points"]:
                mismatches += 1
                bad.append((fi, ch, b, r["points"], ours))
    assert with_points >= 30
    assert mismatches <= max(1, with_points * 0.02), \
        f"{mismatches}/{with_points} scenario mismatches; first: {bad[:5]}"


def test_hfr_skip_agreement(scenarios, our_planes):
    """Bands the reference skipped for low high-frequency ratio must carry
    no gain points in our output either (the wire-visible agreement)."""
    npts = np.asarray(our_planes["gain_npoints"])
    for r in scenarios["records"]:
        if r["skip"] == "low_hfr":
            assert int(npts[r["ch"], r["frame"], r["band"]]) == 0, r
