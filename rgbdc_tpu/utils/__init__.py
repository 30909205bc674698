from .config import Config, model_config, mlic_model_config, tiny_model_config
from .profiling import DeviceTimer, setup_seed, trace_if_enabled

__all__ = [
    "Config",
    "model_config",
    "mlic_model_config",
    "tiny_model_config",
    "DeviceTimer",
    "setup_seed",
    "trace_if_enabled",
]
