"""atracdenc-compatible command-line driver.

Option surface mirrors the reference CLI (reference: src/main.cpp:490-505 and
man/atracdenc.1): -e/--encode=codec, -d/--decode, -i, -o, --bitrate,
--container, --bfuidxconst, --notransient[=mask], --nostdout, --notonal,
--nogaincontrol, --advanced, --yaml-log, -h.
"""
import argparse
import os
import sys

import numpy as np

CODECS = ("atrac1", "atrac3", "atrac3_lp4", "atrac3plus")

# codec -> allowed containers (main.cpp:168-194)
CONTAINER_MATRIX = {
    "atrac1": {"aea", "raw"},
    "atrac3": {"oma", "riff", "rm", "raw"},
    "atrac3_lp4": {"oma", "riff", "rm", "raw"},
    "atrac3plus": {"oma", "riff", "raw"},
}

_EXT_CONTAINER = {
    ".aea": "aea", ".oma": "oma", ".aa3": "oma", ".at3": "riff",
    ".wav": "riff", ".rm": "rm",
}


def _container_from_ext(path, codec):
    ext = os.path.splitext(path)[1].lower()
    if ext in _EXT_CONTAINER:
        return _EXT_CONTAINER[ext]
    return "aea" if codec == "atrac1" else "oma"


def build_parser():
    p = argparse.ArgumentParser(
        prog="atracdenc-tpu",
        description="TPU-native ATRAC1/ATRAC3/ATRAC3+ transcoder")
    p.add_argument("-e", "--encode", nargs="?", const="atrac1", metavar="codec",
                   help="encode mode; codec: atrac1 (default), atrac3, atrac3_lp4, atrac3plus")
    p.add_argument("-d", "--decode", action="store_true",
                   help="decode mode (ATRAC1 only, like the reference)")
    p.add_argument("-i", "--in", dest="infile", required=True)
    p.add_argument("-o", "--out", dest="outfile", required=True)
    p.add_argument("--bitrate", type=int, default=0, help="kbit/s (ATRAC3)")
    p.add_argument("--container", choices=("aea", "oma", "riff", "rm", "raw"))
    p.add_argument("--bfuidxconst", type=int, default=0)
    p.add_argument("--bfuidxfast", action="store_true",
                   help="deprecated no-op (kept for reference CLI parity, "
                        "main.cpp:565-567)")
    p.add_argument("--notransient", nargs="?", const="", metavar="mask")
    p.add_argument("--nostdout", action="store_true")
    p.add_argument("--notonal", action="store_true")
    p.add_argument("--nogaincontrol", action="store_true")
    p.add_argument("--advanced", default="")
    p.add_argument("--exact", action="store_true",
                   help="ATRAC1/ATRAC3 encode: reference-float-semantics "
                        "path (byte-identical to the reference binary; "
                        "slower than the TPU path)")
    p.add_argument("--yaml-log", dest="yaml_log")
    return p


def _merge_channel_planes(planes):
    """[C, F, ...] planes -> frame-major stream order [F*C, ...]."""
    out = {}
    for k, v in planes.items():
        c, f = v.shape[:2]
        out[k] = np.swapaxes(np.asarray(v), 0, 1).reshape((c * f,) + v.shape[2:])
    return out


def _split_channel_planes(planes, channels):
    out = {}
    for k, v in planes.items():
        if k == "valid":
            continue
        n = v.shape[0] // channels
        out[k] = v.reshape((n, channels) + v.shape[1:]).swapaxes(0, 1)
    return out


def encode_atrac1(args):
    from atracdenc_tpu.io import audio
    from atracdenc_tpu.containers import aea, raw
    from atracdenc_tpu.models.atrac1 import frame as at1_frame
    from atracdenc_tpu.models.atrac1.encoder import encode_track

    pcm, rate = audio.read(args.infile)
    if rate != 44100:
        sys.exit("Unsupported sample rate. Only 44100Hz is supported now")
    channels, total = pcm.shape

    if args.bfuidxconst and not (1 <= args.bfuidxconst <= 8):
        sys.exit("Wrong bfuidxconst value (1...8)")

    window_mode, window_mask = "auto", 0
    if args.notransient is not None:
        window_mode = "fixed"
        window_mask = int(args.notransient) if args.notransient else 0

    if not args.nostdout:
        print(f"Input file: {args.infile}\n Channels: {channels}\n "
              f"SampleRate: {rate}\n Duration (sec): {total // rate}")

    progress = None
    if not args.nostdout:
        from atracdenc_tpu.utils.progress import print_progress as progress
    if args.exact:
        from atracdenc_tpu.models.atrac1.exact_enc import encode_track_exact
        planes = encode_track_exact(pcm, bfu_idx_const=args.bfuidxconst,
                                    window_mode=window_mode,
                                    window_mask=window_mask)
    else:
        from atracdenc_tpu.utils.operator_log import warn_clipping
        planes = encode_track(pcm, bfu_idx_const=args.bfuidxconst,
                              window_mode=window_mode,
                              window_mask=window_mask, progress=progress)
        warn_clipping(planes, pop=True)
    frames = at1_frame.pack(_merge_channel_planes(planes))

    container = args.container or _container_from_ext(args.outfile, "atrac1")
    if container == "aea":
        aea.write(args.outfile, frames, channels, total)
    elif container == "raw":
        raw.write(args.outfile, frames)
    else:
        sys.exit(f"Unsupported container for ATRAC1: {container}")


def decode_atrac1(args):
    from atracdenc_tpu.io import audio
    from atracdenc_tpu.containers import aea
    from atracdenc_tpu.models.atrac1 import frame as at1_frame
    from atracdenc_tpu.models.atrac1.decoder import decode_track

    frames, channels, title, length = aea.read(args.infile)
    if not args.nostdout:
        print(f"Input file: {args.infile}\n Name: {title}\n Channels: {channels}")
    n = (frames.shape[0] // channels) * channels
    planes = _split_channel_planes(at1_frame.unpack(frames[:n]), channels)
    pcm = decode_track(planes)
    if length:
        pcm = pcm[:, :length]
    audio.write(args.outfile, pcm, 44100)


def decode_atrac3_family(args, container):
    """Decode OMA / RIFF / RealMedia ATRAC3 or ATRAC3+ to PCM (beyond the
    reference, whose decode mode is ATRAC1-only)."""
    from atracdenc_tpu.io import audio

    if container == "oma":
        from atracdenc_tpu.containers import oma
        frames, info = oma.read(args.infile)
        codec = ("atrac3" if info["codec"] == oma.CODEC_ATRAC3
                 else "atrac3plus")
    elif container == "riff":
        from atracdenc_tpu.containers import at3
        frames, info = at3.read(args.infile)
        codec = info["codec"]
    else:
        from atracdenc_tpu.containers import rm
        frames, info = rm.read(args.infile)
        codec = "atrac3"
    channels = info["channels"]
    if not args.nostdout:
        print(f"Input file: {args.infile}\n Codec: {codec}\n "
              f"Channels: {channels}\n FrameSz: {info['frame_size']}")

    if codec == "atrac3":
        from atracdenc_tpu.models.atrac3.decoder import decode_track
        pcm = decode_track(frames, channels=channels,
                           js=info.get("joint_stereo", False))
    else:
        from atracdenc_tpu.models.atrac3p.decoder import decode_track
        pcm = decode_track(frames, channels)
    total = info.get("total_samples", 0)
    if total:
        pcm = pcm[:, :total]
    audio.write(args.outfile, pcm, 44100)


def encode_atrac3(args, lp4=False):
    from atracdenc_tpu.models.atrac3.cli_glue import encode_file
    encode_file(args, lp4=lp4)


def encode_atrac3plus(args):
    from atracdenc_tpu.models.atrac3p.cli_glue import encode_file
    encode_file(args)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.bfuidxfast:
        print("--bfuidxfast option is deprecated and will be removed.")
    if bool(args.encode) == bool(args.decode):
        sys.exit("Select mode: encode or decode")
    try:
        _dispatch(args)
    except SystemExit:
        raise
    except OSError as err:
        # reference: "Aea IO fatal error" / typed IO exceptions
        # (main.cpp:709-713)
        sys.exit(f"IO fatal error: {err}")
    except Exception as err:  # noqa: BLE001 — reference main catches all
        # std::exception (main.cpp:717-720); corrupt compressed input must
        # fail with a message, not a traceback
        sys.exit(f"Encode/Decode error: {str(err) or type(err).__name__}")


def _dispatch(args):
    if args.decode:
        # dispatch by content magic: AEA (ATRAC1, reference-compatible) plus
        # OMA / RIFF / RealMedia ATRAC3/ATRAC3+ decoding — a capability
        # BEYOND the reference, whose decoder is ATRAC1-only
        # (/root/reference/src/main.cpp:649-655); backed by the QA decoders
        # (models/atrac3/decoder.py, models/atrac3p/decoder.py).
        with open(args.infile, "rb") as fp:
            magic = fp.read(4)
        if magic[:3] == b"ea3" or magic[:3] == b"EA3":
            decode_atrac3_family(args, "oma")
        elif magic == b"RIFF":
            decode_atrac3_family(args, "riff")
        elif magic == b".RMF":
            decode_atrac3_family(args, "rm")
        else:
            decode_atrac1(args)
        return

    codec = args.encode
    if codec not in CODECS:
        sys.exit(f"Unknown codec: {codec}")
    container = args.container or _container_from_ext(args.outfile, codec)
    if container not in CONTAINER_MATRIX[codec]:
        sys.exit(f"Container '{container}' is not supported for {codec}")

    if codec == "atrac1":
        encode_atrac1(args)
    elif codec == "atrac3":
        encode_atrac3(args)
    elif codec == "atrac3_lp4":
        encode_atrac3(args, lp4=True)
    else:
        encode_atrac3plus(args)


if __name__ == "__main__":
    main()
