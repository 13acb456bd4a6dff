"""Divergence triage for AT3 byte-identity (VERDICT item: classify every
non-identical frame vs the reference oracle by the first diverging PLANE).

For each golden case, both our frames and the reference's are parsed back
into semantic planes (frame.unpack_channel) and compared plane-by-plane in
stream order; each divergent frame is attributed to the FIRST plane that
differs — which names the machinery that made a different decision:

  gain     -> gain-control curves (plateau/sticky/point0 knife edges)
  tonal    -> tonal extraction / grouping
  num_bfu  -> BFU-count shrink loop
  wordlen  -> bit-allocation bisection (lambda tie-break)
  sfi      -> scaler (lower_bound knife edge)
  mant     -> quantizer rounding (EA tie order)

Usage: python tools/golden_check.py ran the encodes; this tool re-runs them
and prints the per-case, per-plane histogram plus exemplar frames.
  python tools/triage_at3.py [--case NAME] [--json out.json]
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

# plane comparison order == wire order within a channel
PLANE_ORDER = ["gain", "tonal", "num_bfu", "coding_mode", "wordlen",
               "sfi", "mant"]


def classify_frame(ours, ref, channels, js):
    """(first_plane, channel) naming the earliest divergence, or None."""
    from atracdenc_tpu.models.atrac3 import frame as at3_frame
    po = at3_frame.unpack(ours[None], channels, js=js)[0]
    pr = at3_frame.unpack(ref[None], channels, js=js)[0]
    for ch, (a, b) in enumerate(zip(po, pr)):
        for key in PLANE_ORDER:
            va, vb = a[key], b[key]
            if isinstance(va, np.ndarray):
                same = np.array_equal(va, vb)
            else:
                same = va == vb
            if not same:
                return key, ch
    return "padding", -1     # identical planes; slack-byte noise only


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from tools.golden_check import CASES
    from atracdenc_tpu.models.atrac3.encoder import encode_track
    from atracdenc_tpu.models.atrac3 import frame as at3_frame

    report = {}
    for name, npz, pk, rk, kw in CASES:
        if args.case and name != args.case:
            continue
        d = np.load(os.path.join(GOLDEN, npz))
        pcm, ref = d[pk], d[rk]
        planes = encode_track(pcm, **kw)
        ours = at3_frame.pack(planes, kw["frame_bytes"],
                              js=kw.get("js", False))
        bad = np.nonzero(~(ours == ref).all(axis=1))[0]
        hist = {}
        examples = {}
        channels = 1 if pk in ("pcm_mono",) else pcm.shape[0]
        for f in bad:
            try:
                plane, ch = classify_frame(ours[f], ref[f], channels,
                                           kw.get("js", False))
            except Exception as e:          # parser tripped on the stream
                plane, ch = f"parse_error:{type(e).__name__}", -1
            hist[plane] = hist.get(plane, 0) + 1
            examples.setdefault(plane, (int(f), ch))
        ident = float((ours == ref).mean())
        print(f"{name:16s} {100 * ident:8.4f}%  divergent frames "
              f"{len(bad)}/{ref.shape[0]}  first-plane: "
              + ", ".join(f"{k}={v}" for k, v in
                          sorted(hist.items(), key=lambda x: -x[1])))
        for k, (f, ch) in examples.items():
            print(f"    e.g. {k}: frame {f} ch {ch}")
        report[name] = {"identity": ident, "divergent": int(len(bad)),
                        "frames": int(ref.shape[0]), "first_plane": hist}
    if args.json:
        json.dump(report, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
