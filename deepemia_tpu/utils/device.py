"""Accelerator preflight + mesh helpers.

Parity surface: reference ``src/utils/gpu_check.py`` (CUDA detection :29-47,
interactive continue-without-GPU gate :64-91, device info logging :110-133) —
re-imagined for JAX: detects TPU/GPU/CPU backends, reports per-device HBM, and
builds ``jax.sharding.Mesh`` objects for the parallel layer.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

log = logging.getLogger("deepemia_tpu.device")


def backend_info() -> dict:
    import jax

    devices = jax.devices()
    info = {
        "platform": devices[0].platform if devices else "none",
        "num_devices": len(devices),
        "devices": [str(d) for d in devices],
    }
    try:
        m = devices[0].memory_stats() or {}
        if "bytes_limit" in m:
            info["hbm_gb"] = m["bytes_limit"] / 1e9
    except Exception:
        pass
    return info


# honor an explicit CPU request inside the probe too: some sitecustomize
# setups (axon) override the JAX_PLATFORMS env var, so only the config
# update after import reliably selects CPU
_PROBE_SRC = (
    "import os, sys, jax\n"
    "if os.environ.get('JAX_PLATFORMS', '').startswith('cpu'):\n"
    "    try:\n"
    "        jax.config.update('jax_platforms', 'cpu')\n"
    "    except RuntimeError:\n"
    "        pass\n"
    "sys.stdout.write(jax.devices()[0].platform)\n"
)


def probe_backend(timeout_s: float = 60.0) -> Tuple[Optional[bool], str]:
    """Bounded backend-init probe in a FRESH subprocess.

    A broken accelerator runtime (e.g. an unreachable TPU tunnel/driver)
    makes ``jax.devices()`` HANG indefinitely instead of raising — observed
    >20 min on a dropped tunnel. Probing in a subprocess lets a caller that
    has NOT yet committed its own process to backend init (e.g. a retry
    loop polling for the runtime to come back) detect the outage without
    wedging. Returns ``(ok, detail)``: ``(True, platform)`` when a backend
    initialized, ``(False, last stderr line)`` when init errored, and
    ``(None, message)`` when the probe TIMED OUT (init hang).

    For a one-shot preflight in a process that will initialize JAX anyway,
    prefer ``init_backend_watchdog`` — it bounds the real init instead of
    paying a duplicate subprocess jax import.
    """
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=os.environ.copy(),
        )
        if out.returncode == 0 and out.stdout.strip():
            return True, out.stdout.strip()
        err = (out.stderr.strip().splitlines() or ["<no stderr>"])[-1]
        return False, err
    except subprocess.TimeoutExpired:
        return None, f"probe timed out after {timeout_s:.0f}s (init hang)"
    except Exception as e:  # noqa: BLE001 - never block preflight itself
        log.debug("backend probe could not run: %s", e)
        return True, "probe unavailable"


def init_backend_watchdog(timeout_s: Optional[float] = None) -> Optional[bool]:
    """Run the process's first backend init (``jax.devices()``) on a daemon
    thread and wait up to ``timeout_s`` (default: env
    ``DEEPEMIA_TPU_PROBE_TIMEOUT`` or 90 s).

    Costs nothing when the runtime is healthy — it performs the init this
    process needs anyway (subsequent ``jax.devices()`` calls hit the
    cache). Returns True when init completed (including completing with an
    error: the caller's next jax call then raises the real error quickly)
    and None when it is still hanging after the timeout; the stuck daemon
    thread is abandoned (the caller is expected to abort).
    """
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("DEEPEMIA_TPU_PROBE_TIMEOUT", "90"))
    done = threading.Event()

    def _init():
        try:
            import jax

            jax.devices()
        except Exception as e:  # noqa: BLE001 - surfaced by the next jax call
            log.debug("backend init errored in watchdog: %s", e)
        finally:
            done.set()

    t = threading.Thread(
        target=_init, name="deepemia-backend-init", daemon=True
    )
    t.start()
    return True if done.wait(timeout_s) else None


def check_accelerator_availability(
    require_accelerator: bool = False, interactive: bool = True
) -> bool:
    """TPU/GPU preflight. Returns True when an accelerator backend is present.

    On CPU-only: if ``require_accelerator`` raise; else if ``interactive``
    prompt the user to continue (reference gpu_check.py:64-91); else continue
    with a warning.
    """
    # An explicitly-requested CPU backend cannot hang; otherwise bound the
    # first backend init so a dead accelerator runtime fails loudly instead
    # of wedging the process (reference gpu_check reports CUDA state up
    # front for the same reason, gpu_check.py:29-47). The watchdog runs the
    # REAL init this process needs anyway, so a healthy runtime pays
    # nothing extra (no subprocess jax import).
    if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        if init_backend_watchdog() is None:
            from deepemia_tpu.utils.exceptions import PipelineError

            raise PipelineError(
                "JAX backend initialization did not complete within the "
                "preflight timeout (DEEPEMIA_TPU_PROBE_TIMEOUT, default "
                "90s) — the accelerator runtime (TPU driver/tunnel) looks "
                "unreachable. Restore it, raise the timeout on a loaded "
                "host, or set JAX_PLATFORMS=cpu to run on CPU.",
                stage="preflight",
            )
    info = backend_info()
    log_device_info(info)
    if info["platform"] not in ("cpu", "none"):
        return True
    if require_accelerator:
        from deepemia_tpu.utils.exceptions import PipelineError

        raise PipelineError(
            "No TPU/GPU backend available and this task requires one",
            stage="preflight",
        )
    if interactive and os.isatty(0):  # pragma: no cover - interactive only
        resp = input(
            "No accelerator detected — computation will run on CPU and may be "
            "10-50x slower. Continue? [y/N] "
        )
        if resp.strip().lower() not in ("y", "yes"):
            raise SystemExit(1)
    else:
        log.warning("No accelerator detected; continuing on CPU")
    return False


def log_device_info(info: Optional[dict] = None) -> None:
    info = info or backend_info()
    log.info(
        "JAX backend: %s with %d device(s)%s",
        info["platform"],
        info["num_devices"],
        f", HBM {info['hbm_gb']:.1f} GB/device" if "hbm_gb" in info else "",
    )


def maybe_init_distributed() -> bool:
    """Initialize JAX multi-host runtime when a coordinator is configured.

    On TPU pods ``jax.distributed.initialize()`` auto-discovers peers; on
    other platforms it needs JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    env vars. No-op (False) when nothing is configured — single-host runs
    stay untouched. This is the DCN entry point (SURVEY.md §5 communication
    backend: ICI within a pod via the meshes, DCN across hosts via this).
    """
    import os

    if os.environ.get("DEEPEMIA_DISTRIBUTED") != "1" and not os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        return False
    try:
        import jax

        addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if addr and nproc is not None and pid is not None:
            # explicit CPU/GPU cluster spec (a TPU pod auto-discovers)
            jax.distributed.initialize(addr, int(nproc), int(pid))
        else:
            jax.distributed.initialize()
        log.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return True
    except Exception as e:  # noqa: BLE001 - fall back to single host
        log.warning("jax.distributed.initialize failed: %s", e)
        return False


def make_mesh(axes: Optional[Tuple[Tuple[str, int], ...]] = None):
    """Create a device mesh. Default: 1-D data mesh over all local devices."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    if axes is None:
        return Mesh(np.array(devices), ("data",))
    names = tuple(n for n, _ in axes)
    sizes = tuple(s for _, s in axes)
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"Mesh {dict(axes)} needs {total} devices, have {len(devices)}"
        )
    return Mesh(np.array(devices[:total]).reshape(sizes), names)
