from deepemia_tpu.config.config import (
    ConfigStore,
    deep_merge,
    default_config,
    framework_home,
    get_config,
    get_store,
)
from deepemia_tpu.config.schema import validate_config

__all__ = [
    "ConfigStore",
    "deep_merge",
    "default_config",
    "framework_home",
    "get_config",
    "get_store",
    "validate_config",
]
