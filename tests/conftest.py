"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip TPU hardware is not available in CI; all sharding logic is
validated on a virtual CPU mesh exactly the way the reference validates
multi-part logic with fake backends (reference: test/ut/encode_ut.cpp).
"""
import os
import sys

# The axon site hook registers its PJRT plugin at interpreter startup when
# PALLAS_AXON_POOL_IPS is set and the TPU relay claim succeeds.  A
# successful registration routes XLA:CPU compiles through the remote-
# compile helper, whose output targets the SERVER's CPU features —
# compiles slow 4x and the suite segfaulted twice inside
# backend_compile_and_load on a plain elementwise op (2026-08-21).  The
# hook ran before this file, so the only clean escape is re-exec without
# the gate variable; the marker env var prevents a loop.  The re-exec
# lives in pytest_configure (below): at conftest-import time pytest's fd
# capture already owns fd 1, and an exec'd child would write its entire
# report into the dead capture tempfile.


def pytest_configure(config):
    if not (os.environ.get("PALLAS_AXON_POOL_IPS")
            and not os.environ.get("ATRACDENC_CPU_REEXEC")):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    _env = dict(os.environ, ATRACDENC_CPU_REEXEC="1", JAX_PLATFORMS="cpu")
    _env.pop("PALLAS_AXON_POOL_IPS", None)
    # re-invoke via -m (argv[1:] carries the pytest args for both the
    # console script and `python -m pytest` entry styles)
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], _env)


os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent executable cache: the golden suites are compile-dominated on
# this 1-core host; cached compiles cut a cold 15-minute file to seconds.
# The directory is fingerprinted by the host CPU: XLA:CPU stores AOT
# machine code, and entries from a different host (the sandbox VM can
# move between machines) load with a feature-mismatch warning and then
# SIGILL/SIGSEGV or produce ulp-different float results.


def _machine_tag():
    # hash BOTH the model name and the flags line: two hosts can share a
    # flags list while generating incompatible AOT code (a flags-only tag
    # collided across a VM migration on 2026-08-21 and the stale entries
    # segfaulted the suite at load)
    import hashlib
    import platform
    try:
        sig = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")) and len(sig) < 2:
                    sig.append(line.strip())
        if sig:
            return hashlib.sha1("|".join(sorted(sig)).encode()).hexdigest()[:12]
    except OSError:
        pass
    return platform.machine()


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser(f"~/.cache/atracdenc_tpu_jax_{_machine_tag()}"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon sitecustomize hook registers the TPU plugin at interpreter
# startup and pins JAX_PLATFORMS=axon in a way the env var above cannot
# undo once the relay is live (observed 2026-08-19: the whole suite
# silently ran — and Pallas kernels hardware-compiled — through the TPU
# tunnel despite JAX_PLATFORMS=cpu).  The config knob still wins because
# backends initialize lazily; force it before any test touches a device.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
