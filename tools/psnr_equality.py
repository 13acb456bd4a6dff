"""Decode-PSNR equality evidence for the residual divergent golden frames.

docs/BYTE_IDENTITY.md classifies every fast-path divergence from the
reference bitstreams as float noise at decision knife edges.  This tool
quantifies the "no quality impact" half of that claim: for each divergent
golden case it wraps BOTH our encoder's frames and the reference oracle's
golden frames in identical OMA containers, decodes each through the REAL
libavcodec decoder (tools/oracle/ffdec.c — the reference's own QA method),
and reports PSNR vs the input plus the PSNR between the two decodes.

  python tools/psnr_equality.py [--json tests/golden/psnr_equality.json]

Reference for the decode path: /root/reference's encoders are verified by
ear/ffmpeg by upstream; this framework automates it (tests/test_ffmpeg_oracle).
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
GOLDEN = os.path.join(REPO, "tests", "golden")

CASES = [
    ("default", "at3_default_golden.npz", "pcm_in", "ref_frames",
     dict(frame_bytes=384, no_gain_control=False, no_tonal=False)),
    ("default_stress", "at3_default_golden.npz", "pcm_stress", "ref_stress",
     dict(frame_bytes=384, no_gain_control=False, no_tonal=False)),
    ("js_mono", "at3_js_golden.npz", "pcm_mono", "ref_mono",
     dict(frame_bytes=192, js=True, no_gain_control=False, no_tonal=False)),
]


def _build_ffdec(tmp):
    exe = os.path.join(tmp, "ffdec")
    r = subprocess.run(
        ["gcc", "-O2", "-o", exe, os.path.join(HERE, "oracle", "ffdec.c"),
         "-lavformat", "-lavcodec", "-lavutil", "-lswresample"],
        capture_output=True, text=True)
    if r.returncode != 0:
        sys.exit(f"cannot build ffdec: {r.stderr[:300]}")
    return exe


def _decode(exe, path):
    r = subprocess.run([exe, path, path + ".f32"],
                       capture_output=True, text=True, check=True)
    ch, rate, ns = (int(v) for v in r.stdout.split())
    return np.fromfile(path + ".f32", np.float32).reshape(-1, ch).T


def _psnr(a, b):
    m = min(a.shape[1], b.shape[1])
    a, b = a[:, :m], b[:, :m]
    sig = float(np.mean(a ** 2))
    mse = float(np.mean((a - b) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(sig / mse)


def _psnr_vs_input(pcm, dec):
    # delay + polarity by cross-correlation (ffmpeg's atrac3 decode is
    # polarity-inverted; see tests/test_ffmpeg_oracle.py)
    n = 1 << int(np.ceil(np.log2(pcm.shape[1] + dec.shape[1])))
    xc = np.fft.irfft(
        np.fft.rfft(pcm[0], n).conj() * np.fft.rfft(dec[0], n), n)
    lag = int(np.argmax(np.abs(xc[:8192])))
    if xc[lag] < 0:
        dec = -dec
    m = min(pcm.shape[1], dec.shape[1] - lag)
    trim = 2048
    a = pcm[:, trim:m - trim]
    b = dec[:, lag + trim:lag + m - trim]
    sig = float(np.mean(a ** 2))
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(sig / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from atracdenc_tpu.models.atrac3.encoder import encode_track
    from atracdenc_tpu.models.atrac3 import frame as at3_frame
    from atracdenc_tpu.containers import oma

    report = {}
    with tempfile.TemporaryDirectory() as tmp:
        exe = _build_ffdec(tmp)
        for name, npz, pk, rk, kw in CASES:
            d = np.load(os.path.join(GOLDEN, npz))
            pcm, ref = d[pk], d[rk]
            pcm2 = np.atleast_2d(np.asarray(pcm, np.float32))
            ch = pcm2.shape[0]
            js = kw.get("js", False)
            fb = kw["frame_bytes"]

            planes = encode_track(pcm, **kw)
            ours = at3_frame.pack(planes, fb, js=js)

            paths = {}
            for tag, frames in (("ours", ours), ("ref", ref)):
                p = os.path.join(tmp, f"{name}_{tag}.oma")
                oma.write(p, np.asarray(frames, np.uint8), oma.CODEC_ATRAC3,
                          fb, channels=ch, joint_stereo=js)
                paths[tag] = p
            dec_o = _decode(exe, paths["ours"])
            dec_r = _decode(exe, paths["ref"])
            ident = float((np.asarray(ours, np.uint8)
                           == np.asarray(ref, np.uint8)).mean())
            report[name] = {
                "bytes_identical": round(ident, 6),
                "psnr_ours_vs_input_db": round(_psnr_vs_input(pcm2, dec_o), 3),
                "psnr_ref_vs_input_db": round(_psnr_vs_input(pcm2, dec_r), 3),
                "psnr_ours_vs_ref_decode_db": round(_psnr(dec_o, dec_r), 3),
            }
            print(name, report[name], flush=True)
    if args.json:
        json.dump(report, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
