"""Persistent XLA compilation cache, namespaced per host.

The suite/bench/dryrun wall time is dominated by XLA compiles, so all entry
points keep a persistent ``jax_compilation_cache_dir``. But XLA:CPU cache
entries are AOT-compiled machine code keyed to the *compile* machine's CPU
feature set; when the repo (and its warm cache) moves to a different host,
the loader emits "Machine type used for XLA:CPU compilation doesn't match
the machine type for execution ... could lead to execution errors such as
SIGILL" and proceeds anyway (observed live: entries compiled with
avx512/amx `prefer-no-scatter` features loading on a host without them).
Foreign AOT code is a silent-wrong-numerics / SIGILL hazard, so the cache
directory is suffixed with a fingerprint of the host CPU + jax version:
every machine populates and reads only its own namespace.

Replaces the reference's approach of having no compilation caching at all
(each deepEMIA run re-JITs nothing — PyTorch eager — but pays the model
load instead; /root/reference/src/data/models.py:134-160).
"""

from __future__ import annotations

import os
import zlib
from typing import Optional


def host_fingerprint() -> str:
    """Stable-per-host hash: machine identity + CPU features + jax version.

    Round-3 lesson: cpuinfo flags alone do NOT discriminate hosts — XLA:CPU
    bakes pseudo-features like ``+prefer-no-gather`` into its AOT entries
    that are a function of the compile machine's LLVM target choice, not of
    the visible flag list, so two fleet hosts with identical ``/proc/cpuinfo``
    flags still produce mutually-unloadable AOT code (observed live as the
    MULTICHIP_r03 failure). The namespace therefore keys on per-machine
    identity (``/etc/machine-id`` + hostname) so a cache directory that
    travels with the repo is never shared across machines at all.
    """
    import platform

    import jax

    bits = ["jax=" + jax.__version__, "node=" + platform.node()]
    try:
        with open("/etc/machine-id") as f:
            bits.append("mid=" + f.read().strip())
    except OSError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes "flags", arm64 "Features"; the first such line
                # describes core 0 and is identical across cores.
                if line.startswith(("flags", "Features")):
                    bits.append(line.strip())
                    break
    except OSError:
        bits.append(platform.processor() or platform.machine())
    return format(zlib.crc32("|".join(bits).encode()), "08x")


def setup_compilation_cache(
    env_var: str = "DEEPEMIA_TPU_TEST_XLA_CACHE",
    default_base: Optional[str] = None,
    min_compile_secs: float = 1.0,
) -> Optional[str]:
    """Point jax at ``<base>/<host_fingerprint>``; returns the path.

    ``base`` comes from ``os.environ[env_var]`` when set, else
    ``default_base`` (default ``~/.cache/deepemia_tpu_test_xla``). The
    value ``"0"`` disables caching entirely (returns None). Safe to call
    more than once and after jax is initialized.
    """
    base = os.environ.get(
        env_var,
        default_base
        or os.path.join(
            os.path.expanduser("~"), ".cache", "deepemia_tpu_test_xla"
        ),
    )
    if base == "0":
        return None
    import jax

    path = os.path.join(base, host_fingerprint())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_secs),
        )
    except RuntimeError:
        # config already frozen by an earlier initialization — keep going
        # with whatever cache (or none) that initialization chose.
        return None
    return path
