"""Byte-identity report against the reference-oracle golden frames.

Runs every AT3 golden vector through the current encoder on the current
backend and prints per-mode byte identity.  This is the perf-work guard
(run after each optimization) and the input for divergence triage.

Usage:  python tools/golden_check.py [--json out.json] [--diff]
"""
import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
GOLDEN = os.path.join(REPO, "tests", "golden")

CASES = [
    # (name, npz, pcm key, ref key, encode kwargs)
    ("plain", "at3_golden.npz", "pcm_in", "ref_frames",
     dict(frame_bytes=384)),
    ("default", "at3_default_golden.npz", "pcm_in", "ref_frames",
     dict(frame_bytes=384, no_gain_control=False, no_tonal=False)),
    ("default_stress", "at3_default_golden.npz", "pcm_stress", "ref_stress",
     dict(frame_bytes=384, no_gain_control=False, no_tonal=False)),
    ("tonal", "at3_tonal_golden.npz", "pcm_in", "ref_frames",
     dict(frame_bytes=384, no_tonal=False)),
    ("tonal_dense", "at3_tonal_dense_golden.npz", "pcm_in", "ref_frames",
     dict(frame_bytes=384, no_tonal=False)),
    ("js", "at3_js_golden.npz", "pcm_in", "ref_frames",
     dict(frame_bytes=192, js=True, no_gain_control=False, no_tonal=False)),
    ("js_mono", "at3_js_golden.npz", "pcm_mono", "ref_mono",
     dict(frame_bytes=192, js=True, no_gain_control=False, no_tonal=False)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--diff", action="store_true",
                    help="print first diverging byte per non-identical frame")
    args = ap.parse_args()

    from atracdenc_tpu.models.atrac3.encoder import encode_track
    from atracdenc_tpu.models.atrac3 import frame as at3_frame

    report = {}
    total_ok = total = 0
    for name, npz, pk, rk, kw in CASES:
        d = np.load(os.path.join(GOLDEN, npz))
        pcm, ref = d[pk], d[rk]
        planes = encode_track(pcm, **kw)
        ours = at3_frame.pack(planes, kw["frame_bytes"],
                              js=kw.get("js", False))
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        eq = (ours == ref)
        ident = float(eq.mean())
        frames_ok = int(eq.all(axis=1).sum())
        report[name] = {"byte_identity": round(ident, 6),
                        "frames_identical": f"{frames_ok}/{ref.shape[0]}"}
        total_ok += eq.sum()
        total += eq.size
        print(f"{name:16s} bytes {ident*100:8.4f}%   frames "
              f"{frames_ok}/{ref.shape[0]}")
        if args.diff and frames_ok < ref.shape[0]:
            for f in np.nonzero(~eq.all(axis=1))[0]:
                b = int(np.nonzero(ours[f] != ref[f])[0][0])
                print(f"  frame {f}: first diff at byte {b} "
                      f"(ours {ours[f, b]:02x} ref {ref[f, b]:02x})")
    print(f"{'TOTAL':16s} bytes {100.0 * total_ok / total:8.4f}%")
    report["total"] = round(total_ok / total, 6)
    if args.json:
        json.dump(report, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
