"""Root-cause triage for GAIN-plane divergences (VERDICT r3 item 4).

For each gain-divergent frame of a golden case, separates the two possible
causes:

  logic  — the fast path's batched curve builder (models/atrac3/gain.py)
           makes a different decision than the reference's CalcCurve /
           CreateSubbandInfo on the SAME analysis values;
  noise  — the curve logic is faithful, but upstream float noise (conv QMF
           + matmul upsampler vs the reference's scalar FIR + kissfft)
           crosses a hard threshold.

Method: three independent curve sets per (frame, ch, band):

  A = the fast path's curves (from our encoded planes);
  D = the op-exact oracle (exact_gain.create_subband_info, reference float
      semantics op-for-op) replayed over the FAST path's band samples;
  C = the op-exact oracle over the EXACT path's band samples — equal to the
      reference bitstream's curves by construction (test_at3_exact pins the
      whole exact path at 100% bytes).

  A == D != C  ->  noise at a knife edge (report the flipped comparison)
  A != D       ->  fast-path logic divergence (a bug; fix it)

Usage: python tools/triage_gain.py [--case default_stress|js_mono] [--json f]
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

f32 = np.float32

CASES = {
    "default_stress": ("at3_default_golden.npz", "pcm_stress", "ref_stress",
                       dict(frame_bytes=384, no_gain_control=False,
                            no_tonal=False)),
    "js_mono": ("at3_js_golden.npz", "pcm_mono", "ref_mono",
                dict(frame_bytes=192, js=True, no_gain_control=False,
                     no_tonal=False)),
}


def curves_from_planes(p, ci, fi):
    """plane dict entry -> list of 4 [(level, loc)] lists."""
    out = []
    for band in range(4):
        n = int(p["gain_npoints"][ci, fi, band])
        out.append([(int(p["gain_levels"][ci, fi, band, k]),
                     int(p["gain_locs"][ci, fi, band, k]))
                    for k in range(n)])
    return out


def replay_oracle(bands_ext, nf):
    """Run the op-exact CreateSubbandInfo chain over [C, F+1, 4, 256] band
    samples; returns curves[c][f][band] point lists."""
    from atracdenc_tpu.models.atrac3 import exact_gain as G

    c = bands_ext.shape[0]
    ctxs = [[G.CurveCtx() for _ in range(4)] for _ in range(c)]
    curves = [[None] * nf for _ in range(c)]
    for fi in range(nf):
        for ci in range(c):
            ups = []
            for band in range(4):
                prev_tail = (bands_ext[ci, fi - 1, band, 128:] if fi > 0
                             else np.zeros(128, f32))
                nxt = bands_ext[ci, fi + 1, band, :128]
                ups.append(np.concatenate(
                    [prev_tail, bands_ext[ci, fi, band], nxt]))
            curves[ci][fi] = G.create_subband_info(ups, ctxs[ci])
    return curves


def fast_bands_ext(pcm, js):
    """The FAST path's band samples, extended with ITS lookahead semantics
    (silence after the last frame — encoder.encode_frames next_pcm=None)."""
    import jax.numpy as jnp
    from atracdenc_tpu.models.atrac3.encoder import band_frames

    x = jnp.asarray(pcm)
    bands = np.asarray(band_frames(x))                 # [C, F, 4, 256]
    if js and bands.shape[0] == 2:
        # mono JS input has no side channel to matrix (encoder gate:
        # `if js and c == 2`, models/atrac3/encoder.py)
        bands = np.stack([(bands[0] + bands[1]) * f32(0.5),
                          (bands[0] - bands[1]) * f32(0.5)])
    c, nfr = bands.shape[:2]
    return np.concatenate(
        [bands, np.zeros((c, 1, 4, 256), f32)], axis=1)


def exact_bands_ext(pcm, js):
    """The EXACT path's band samples incl. the reference drain-pass stale
    lookahead (exact_enc.encode_track_exact semantics)."""
    from atracdenc_tpu.models.atrac3.exact_enc import _analysis_tree

    pcm = np.atleast_2d(np.asarray(pcm, f32))
    nf = pcm.shape[1] // 1024
    pcm4 = (pcm / f32(4.0)).astype(f32)
    if nf % 4 == 0 and nf >= 4:
        stale = pcm4[:, (nf - 4) * 1024: (nf - 3) * 1024]
    else:
        stale = np.zeros((pcm.shape[0], 1024), f32)
    ext = np.concatenate([pcm4, stale], axis=1)
    bands_ext = _analysis_tree(ext)
    if js and bands_ext.shape[0] == 2:
        bands_ext = np.stack([(bands_ext[0] + bands_ext[1]) * f32(0.5),
                              (bands_ext[0] - bands_ext[1]) * f32(0.5)])
    return bands_ext


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="default_stress", choices=CASES)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    npz, pk, rk, kw = CASES[args.case]
    d = np.load(os.path.join(GOLDEN, npz))
    pcm, ref = d[pk], d[rk]
    js = kw.get("js", False)

    from atracdenc_tpu.models.atrac3.encoder import encode_track
    from atracdenc_tpu.models.atrac3 import frame as at3_frame

    planes = encode_track(pcm, **kw)
    ours = at3_frame.pack(planes, kw["frame_bytes"], js=js)
    nf = ref.shape[0]
    c = 1 if pcm.ndim == 1 or pcm.shape[0] == 1 else 2
    # unpack both streams into plane dicts per frame
    po = at3_frame.unpack(ours, c, js=js)
    pr = at3_frame.unpack(ref, c, js=js)

    print(f"case {args.case}: {nf} frames; replaying oracles ...")
    fb = fast_bands_ext(np.atleast_2d(np.asarray(pcm, f32)), js)
    eb = exact_bands_ext(pcm, js)
    curves_D = replay_oracle(fb, nf)
    curves_C = replay_oracle(eb, nf)

    report = []
    for fi in range(nf):
        for ci in range(c):
            for band in range(4):
                A = _pts(po[fi][ci], band)
                B = _pts(pr[fi][ci], band)
                if A == B:
                    continue
                Dp = [(lv, lc) for lv, lc in curves_D[ci][fi][band]]
                Cp = [(lv, lc) for lv, lc in curves_C[ci][fi][band]]
                cls = ("noise" if A == Dp else
                       ("drain" if fi == nf - 1 else "LOGIC"))
                report.append({
                    "frame": fi, "ch": ci, "band": band, "class": cls,
                    "ours": A, "ref": B,
                    "oracle_on_fast_inputs": Dp,
                    "oracle_on_exact_inputs": Cp,
                    "oracle_matches_ref": Cp == B,
                })
                print(f"f{fi:3d} ch{ci} band{band}: {cls:6s} "
                      f"A{A} B{B} D{Dp} C{Cp} C==B:{Cp == B}")
    n_logic = sum(r["class"] == "LOGIC" for r in report)
    print(f"{len(report)} divergent (frame,ch,band) entries; "
          f"{n_logic} unexplained-logic")
    if args.json:
        json.dump(report, open(args.json, "w"), indent=1)


def _pts(chplanes, band):
    g = chplanes["gain"]
    # frame.unpack returns gain as [(level, loc) lists per band] or arrays
    ent = g[band]
    return [(int(lv), int(lc)) for lv, lc in ent]


if __name__ == "__main__":
    main()
