"""Fast-tier GHA quality guardrail (VERDICT r3 item 8).

A reduced single-clip version of the slow-tier music-corpus floor
(tests/test_ffmpeg_oracle.py::test_at3p_gha_music_corpus_no_regression):
the full corpus sweep stays in the slow tier, but this one clip runs under
`pytest -m "not slow"` so a perf patch to the GHA estimator numerics
cannot silently trade away the measured +6.4 to +12 dB real-decoder
advantage without failing the default suite.

Reference for the duty being guarded: the reference encoder's tonal path
(/root/reference/src/atrac/at3p/at3p_gha.cpp) is only verifiable through
external decoders (SURVEY.md §4); same here, via tools/oracle/ffdec.c.
Skips (like the slow tier) when libavcodec headers are unavailable.
"""
import pytest

# importing the fixture function registers it for this module too
# (tests/ is not a package: pytest imports these files top-level)
from test_ffmpeg_oracle import (AT3P_DELAY, _decode, _psnr, _tonal_pcm,
                                ffdec)  # noqa: F401

pytestmark = []  # override nothing: this module IS the fast tier


def test_at3p_gha_advantage_fast_floor(ffdec, tmp_path):  # noqa: F811
    """One short tonal clip, GHA off vs on, through real libavcodec.

    Floors are set well below the slow-tier measurements (+6.4 dB gain on
    this material, off-mode ~28-30 dB) but far above noise: a regression
    that halves the GHA advantage or breaks tone synthesis fails here.
    """
    from atracdenc_tpu.models.atrac3p import frame as at3p_frame, tables as T
    from atracdenc_tpu.models.atrac3p.encoder import encode_track
    from atracdenc_tpu.containers import oma

    pcm = _tonal_pcm(seconds=1.0)
    psnr = {}
    for use_gha in (False, True):
        planes = encode_track(pcm, use_gha=use_gha)
        frames = at3p_frame.pack(planes, 2)
        path = str(tmp_path / f"g{use_gha}.oma")
        oma.write(path, frames, oma.CODEC_ATRAC3PLUS, T.FRAME_BYTES,
                  channels=2)
        dec, rate = _decode(ffdec, path)
        assert rate == 44100
        psnr[use_gha] = _psnr(pcm, dec, AT3P_DELAY, trim=4096)
    # transform-only path must stay healthy...
    assert psnr[False] > 26.0, psnr
    # ...and GHA must still clearly HELP through a real decoder
    assert psnr[True] > psnr[False] + 3.0, psnr
