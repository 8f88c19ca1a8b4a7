"""Artifact storage abstraction with retry/backoff.

Parity surface: reference ``src/utils/gcs_utils.py`` — gsutil subprocess
wrapper with 3-retry exponential backoff (:34-71), dataset download (:74-108),
timestamped ``Archive/<ts>/`` upload (:111-162), selective inference-results
upload with essential-file allowlist + per-file fallback + upload summary
(:165-452) — and the bucket layout in
``docs/architecture/cloud-integration.md:7-18``
(``DATASET/<name>/``, ``DATASET/INFERENCE/``, ``Archive/<timestamp>/``).

Redesign: a ``Storage`` interface with two backends — ``LocalStorage``
(directory-backed, default; makes the whole pipeline runnable hermetically and
is what CI uses) and ``GsutilStorage`` (subprocess gsutil when configured and
available). The retry logic lives in the base class so both share it.
"""

from __future__ import annotations

import logging
import shutil
import subprocess
import time
from fnmatch import fnmatch
from pathlib import Path
from typing import Callable, List, Optional, Sequence

from deepemia_tpu.utils.exceptions import StorageError

log = logging.getLogger("deepemia_tpu.storage")

# Patterns considered "essential" inference results for selective upload
# (reference gcs_utils.py:165-260's allowlist behavior).
ESSENTIAL_RESULT_PATTERNS = (
    "*measurements_results.csv",
    "*_results.csv",
    "*metrics.csv",
    "*.png",
    "*.jpg",
    "*upload_summary.txt",
    "*.log",
)


def with_retry(
    fn: Callable[[], None],
    attempts: int = 3,
    base_delay: float = 2.0,
    what: str = "storage op",
) -> None:
    """Run ``fn`` with exponential backoff: delays 2·2^a seconds (reference
    gcs_utils.py:34-71)."""
    last: Optional[Exception] = None
    for attempt in range(attempts):
        try:
            fn()
            return
        except Exception as e:  # noqa: BLE001 - uniform retry surface
            last = e
            delay = base_delay * (2**attempt)
            log.warning(
                "%s failed (attempt %d/%d): %s — retrying in %.0fs",
                what,
                attempt + 1,
                attempts,
                e,
                delay,
            )
            if attempt < attempts - 1:
                time.sleep(delay)
    raise StorageError(f"{what} failed after {attempts} attempts: {last}")


class Storage:
    """Abstract artifact store with the deepEMIA bucket layout."""

    def download_dataset(self, dataset_name: str, local_dir: Path) -> None:
        raise NotImplementedError

    def download_file(self, remote_rel: str, local_path: Path) -> None:
        raise NotImplementedError

    def upload_tree(self, local_dir: Path, remote_rel: str) -> None:
        raise NotImplementedError

    def upload_file(self, local_path: Path, remote_rel: str) -> None:
        raise NotImplementedError

    # -- shared high-level operations --------------------------------------

    def archive_results(
        self,
        sources: Sequence[Path],
        timestamp: Optional[str] = None,
    ) -> str:
        """Upload result files/dirs into ``Archive/<timestamp>/`` (reference
        gcs_utils.py:111-162; the reference's +2h timestamp hack is dropped)."""
        ts = timestamp or time.strftime("%Y-%m-%d_%H-%M-%S")
        dest = f"Archive/{ts}"
        for src in sources:
            src = Path(src)
            if not src.exists():
                continue
            if src.is_dir():
                self.upload_tree(src, f"{dest}/{src.name}")
            else:
                self.upload_file(src, f"{dest}/{src.name}")
        return dest

    def upload_inference_results(
        self, result_dir: Path, timestamp: Optional[str] = None
    ) -> List[Path]:
        """Selective upload of essential result files with per-file fallback
        and a generated upload summary (reference gcs_utils.py:165-452)."""
        result_dir = Path(result_dir)
        ts = timestamp or time.strftime("%Y-%m-%d_%H-%M-%S")
        files = [
            p
            for p in sorted(result_dir.rglob("*"))
            if p.is_file()
            and any(fnmatch(p.name, pat) for pat in ESSENTIAL_RESULT_PATTERNS)
        ]
        uploaded: List[Path] = []
        failed: List[Path] = []
        for p in files:
            rel = p.relative_to(result_dir)
            try:
                with_retry(
                    lambda p=p, rel=rel: self.upload_file(
                        p, f"Archive/{ts}/{rel}"
                    ),
                    what=f"upload {rel}",
                )
                uploaded.append(p)
            except StorageError:
                failed.append(p)
        summary = result_dir / "upload_summary.txt"
        with open(summary, "w") as f:
            f.write(f"Upload at {ts}\nUploaded {len(uploaded)} files\n")
            for p in uploaded:
                f.write(f"  OK   {p.relative_to(result_dir)}\n")
            for p in failed:
                f.write(f"  FAIL {p.relative_to(result_dir)}\n")
        try:
            self.upload_file(summary, f"Archive/{ts}/upload_summary.txt")
        except Exception:  # noqa: BLE001
            pass
        return uploaded


class LocalStorage(Storage):
    """Directory-backed store mirroring the GCS bucket layout locally."""

    def __init__(self, root: Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def download_dataset(self, dataset_name: str, local_dir: Path) -> None:
        src = self.root / "DATASET" / dataset_name
        if not src.exists():
            raise StorageError(f"Dataset not found in store: {src}")
        local_dir = Path(local_dir)
        if local_dir.exists():
            shutil.rmtree(local_dir)
        shutil.copytree(src, local_dir)

    def download_file(self, remote_rel: str, local_path: Path) -> None:
        src = self.root / remote_rel
        if not src.exists():
            raise StorageError(f"File not found in store: {src}")
        local_path = Path(local_path)
        local_path.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, local_path)

    def upload_tree(self, local_dir: Path, remote_rel: str) -> None:
        dst = self.root / remote_rel
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(local_dir, dst)

    def upload_file(self, local_path: Path, remote_rel: str) -> None:
        dst = self.root / remote_rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(local_path, dst)


class GsutilStorage(Storage):
    """gsutil-subprocess backend (used when a bucket is configured and the
    gsutil binary is on PATH)."""

    def __init__(self, bucket: str):
        if not bucket:
            raise StorageError("GsutilStorage requires a bucket name")
        self.bucket = bucket.rstrip("/")

    def _run(self, *args: str) -> None:
        cmd = ["gsutil", "-m", *args]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise StorageError(
                f"gsutil failed ({proc.returncode}): {proc.stderr.strip()[:500]}"
            )

    def download_dataset(self, dataset_name: str, local_dir: Path) -> None:
        local_dir = Path(local_dir)
        if local_dir.exists():
            shutil.rmtree(local_dir)
        local_dir.mkdir(parents=True, exist_ok=True)
        with_retry(
            lambda: self._run(
                "cp", "-r", f"gs://{self.bucket}/DATASET/{dataset_name}/*",
                str(local_dir),
            ),
            what=f"download dataset {dataset_name}",
        )

    def download_file(self, remote_rel: str, local_path: Path) -> None:
        Path(local_path).parent.mkdir(parents=True, exist_ok=True)
        with_retry(
            lambda: self._run(
                "cp", f"gs://{self.bucket}/{remote_rel}", str(local_path)
            ),
            what=f"download {remote_rel}",
        )

    def upload_tree(self, local_dir: Path, remote_rel: str) -> None:
        with_retry(
            lambda: self._run(
                "cp", "-r", str(local_dir), f"gs://{self.bucket}/{remote_rel}"
            ),
            what=f"upload tree {remote_rel}",
        )

    def upload_file(self, local_path: Path, remote_rel: str) -> None:
        with_retry(
            lambda: self._run(
                "cp", str(local_path), f"gs://{self.bucket}/{remote_rel}"
            ),
            what=f"upload {remote_rel}",
        )


def storage_from_config(config: dict) -> Storage:
    """Pick a backend: gsutil when a bucket is configured and gsutil exists,
    else a local directory store under the framework home."""
    bucket = config.get("bucket") or ""
    if bucket and shutil.which("gsutil"):
        return GsutilStorage(bucket)
    from deepemia_tpu.config import framework_home

    return LocalStorage(framework_home() / "bucket")
