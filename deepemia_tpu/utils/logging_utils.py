"""Logging setup + memory telemetry.

Parity surface: reference ``src/utils/logger_utils.py`` — ``system`` logger
with DEBUG file handler + INFO console handler (:44-63), runtime console level
setter (:32-41), RAM/accelerator memory snapshots (:66-96).

Redesign: logger configuration is explicit (``setup_logging()``) rather than a
module-import side effect, and device memory stats come from JAX
(``device.memory_stats()``) instead of ``torch.cuda``.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Optional

_LOGGER_NAME = "deepemia_tpu"
_configured = False

system_logger = logging.getLogger(_LOGGER_NAME)

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}


def setup_logging(
    logs_dir: Optional[str] = None, console_level: str = "info"
) -> logging.Logger:
    """Configure the framework logger: DEBUG file handler (timestamped file in
    ``logs_dir``) + console handler at ``console_level``."""
    global _configured
    logger = logging.getLogger(_LOGGER_NAME)
    if _configured:
        set_console_log_level(console_level)
        return logger
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    console = logging.StreamHandler()
    console.setLevel(_LEVELS.get(console_level.lower(), logging.INFO))
    console.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    console._deepemia_console = True  # type: ignore[attr-defined]
    logger.addHandler(console)

    if logs_dir:
        path = Path(os.path.expanduser(logs_dir))
        path.mkdir(parents=True, exist_ok=True)
        ts = time.strftime("%Y%m%d_%H%M%S")
        fh = logging.FileHandler(path / f"system_{ts}.log")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname)s %(name)s %(filename)s:%(lineno)d: "
                "%(message)s"
            )
        )
        logger.addHandler(fh)

    _configured = True
    return logger


def set_console_log_level(level: str) -> None:
    """Adjust console handler level at runtime (reference logger_utils.py:32-41)."""
    logger = logging.getLogger(_LOGGER_NAME)
    for h in logger.handlers:
        if getattr(h, "_deepemia_console", False):
            h.setLevel(_LEVELS.get(level.lower(), logging.INFO))


def log_memory_usage(tag: str = "") -> dict:
    """Snapshot host RSS + per-device HBM stats (reference logger_utils.py:66-96,
    with jax device stats replacing torch.cuda counters)."""
    stats: dict = {}
    try:
        import psutil

        rss = psutil.Process().memory_info().rss
        stats["host_rss_mb"] = rss / 1e6
    except Exception:  # pragma: no cover
        pass
    try:
        import jax

        for d in jax.local_devices():
            m = d.memory_stats() or {}
            if "bytes_in_use" in m:
                stats[f"{d.platform}{d.id}_hbm_mb"] = m["bytes_in_use"] / 1e6
    except Exception:  # pragma: no cover
        pass
    if stats:
        system_logger.debug(
            "memory%s: %s",
            f" [{tag}]" if tag else "",
            ", ".join(f"{k}={v:.1f}" for k, v in stats.items()),
        )
    return stats
