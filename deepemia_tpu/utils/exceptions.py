"""Framework exception hierarchy.

Parity surface: reference ``src/utils/exceptions.py:9-42`` (PipelineError base
with stage/details formatting + Configuration/ModelLoad/Training subclasses);
extended with inference/data/storage stages used by the TPU pipeline.
"""

from __future__ import annotations

from typing import Any, Dict, Optional


class PipelineError(Exception):
    """Base error for all pipeline failures, carrying stage and detail context."""

    def __init__(
        self,
        message: str,
        stage: Optional[str] = None,
        details: Optional[Dict[str, Any]] = None,
    ):
        super().__init__(message)
        self.message = message
        self.stage = stage
        self.details = details or {}

    def __str__(self) -> str:
        parts = [self.message]
        if self.stage:
            parts.append(f"[stage: {self.stage}]")
        if self.details:
            detail_str = ", ".join(f"{k}={v!r}" for k, v in self.details.items())
            parts.append(f"({detail_str})")
        return " ".join(parts)


class ConfigurationError(PipelineError):
    """Invalid or missing configuration."""

    def __init__(self, message: str, **kw):
        super().__init__(message, stage="configuration", **kw)


class ModelLoadError(PipelineError):
    """Checkpoint discovery/restore failure."""

    def __init__(self, message: str, **kw):
        super().__init__(message, stage="model_load", **kw)


class TrainingError(PipelineError):
    """Training-loop failure."""

    def __init__(self, message: str, **kw):
        super().__init__(message, stage="training", **kw)


class InferenceError(PipelineError):
    """Inference-pipeline failure."""

    def __init__(self, message: str, **kw):
        super().__init__(message, stage="inference", **kw)


class DataError(PipelineError):
    """Dataset split/registration/parsing failure."""

    def __init__(self, message: str, **kw):
        super().__init__(message, stage="data", **kw)


class StorageError(PipelineError):
    """Remote/local artifact storage failure."""

    def __init__(self, message: str, **kw):
        super().__init__(message, stage="storage", **kw)
