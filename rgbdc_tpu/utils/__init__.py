from .config import Config, model_config, mlic_model_config, tiny_model_config
from .profiling import DeviceTimer, setup_seed, trace_if_enabled


def count_parameters(params) -> int:
    """Total parameter count (reference models/elic.py:338-342)."""
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


__all__ = [
    "Config",
    "model_config",
    "mlic_model_config",
    "tiny_model_config",
    "DeviceTimer",
    "setup_seed",
    "trace_if_enabled",
    "count_parameters",
]
