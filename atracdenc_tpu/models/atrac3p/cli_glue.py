"""File-level ATRAC3+ encode path for the CLI driver.

Mirrors PrepareAtrac3PEncoder (reference: src/main.cpp:427-483): fixed
2048-byte frames at 352.8 kbit/s, OMA/RIFF/RAW containers.
"""
import os
import sys


def encode_file(args):
    import numpy as np
    from atracdenc_tpu.io import audio
    from atracdenc_tpu.containers import oma, at3, raw
    from . import tables as T
    from .encoder import encode_track

    pcm, rate = audio.read(args.infile)
    if rate != 44100:
        sys.exit("Unsupported sample rate. Only 44100Hz is supported now")
    channels = pcm.shape[0]

    if not args.nostdout:
        print(f"Input file: {args.infile}\n Channels: {channels}\n "
              f"SampleRate: {rate}\n Codec: ATRAC3Plus")

    # --advanced ghadbg=MASK / ghawbrefine=MODE (reference
    # TAt3PEnc::ParseAdvancedOpt + SetGha/SetWidebandRefine,
    # at3p.cpp:195-284); mask bits: 1=GHA_PASS_INPUT, 2=GHA_WRITE_TONAL,
    # 4=GHA_WRITE_RESIUDAL, 8=GHA_WIDEBAND
    use_gha = True
    wb_refine = False
    for kv in (args.advanced or "").split(","):
        if kv.startswith("ghadbg="):
            mask = int(kv.split("=")[1])
            if mask > 15 or mask < 0:
                sys.exit("invalud value of GHA processing mask")
            for bit, name in ((1, "GHA_PASS_INPUT"), (2, "GHA_WRITE_TONAL"),
                              (4, "GHA_WRITE_RESIUDAL"), (8, "GHA_WIDEBAND")):
                if mask & bit:
                    print(name, file=sys.stderr)
            use_gha = mask
        elif kv.startswith("ghawbrefine="):
            mode = int(kv.split("=")[1])
            if mode < 0 or mode > 1:
                sys.exit("invalid ghawbrefine value "
                         "(expected 0=subband or 1=raw)")
            wb_refine = mode == 1
            print("GHA_WIDEBAND_REFINE=" + ("raw" if mode else "subband"),
                  file=sys.stderr)

    progress = None
    if not args.nostdout:
        from atracdenc_tpu.utils.progress import print_progress as progress
    planes = encode_track(pcm, use_gha=use_gha, wb_refine=wb_refine,
                          progress=progress)
    # plane-wise on-device serializer (byte-identical to the host walk,
    # tests/test_at3p_device_pack.py)
    import jax
    import jax.numpy as jnp
    from .device_pack import pack_device
    frames = np.asarray(jax.device_get(pack_device(
        {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
             else jnp.asarray(v)) for k, v in planes.items()}, channels)))

    container = args.container
    if container is None:
        ext = os.path.splitext(args.outfile)[1].lower()
        container = {".oma": "oma", ".aa3": "oma", ".wav": "riff",
                     ".at3": "riff"}.get(ext, "oma")

    if container == "oma":
        oma.write(args.outfile, frames, oma.CODEC_ATRAC3PLUS, T.FRAME_BYTES,
                  channels=channels)
    elif container == "riff":
        at3.write_at3p(args.outfile, frames, T.FRAME_BYTES, channels=channels)
    elif container == "raw":
        raw.write(args.outfile, frames)
    else:
        sys.exit(f"Unsupported container for ATRAC3+: {container}")
