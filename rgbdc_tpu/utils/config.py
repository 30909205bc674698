"""Model hyperparameter configs (reference config/config.py:5-22)."""

import json


class Config(dict):
    """dict with attribute access and optional JSON loading
    (reference utils/IOutils.py:14-22)."""

    def __init__(self, data=None):
        super().__init__()
        if isinstance(data, str):
            with open(data) as f:
                data = json.load(f)
        if data:
            self.update(data)

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value


def model_config() -> Config:
    """ELIC-family config: N=192, M=320, 5 uneven slices, STE quantization."""
    return Config(
        {
            "N": 192,
            "M": 320,
            "slice_num": 5,
            "context_window": 5,
            "slice_ch": [16, 16, 32, 64, 192],
            "quant": "ste",
        }
    )


def mlic_model_config() -> Config:
    """MLIC/MLIC++ config: 10 even slices, GELU activations."""
    return Config(
        {
            "N": 192,
            "M": 320,
            "slice_num": 10,
            "context_window": 5,
            "act": "gelu",
        }
    )


def tiny_model_config() -> Config:
    """Scaled-down config for smoke tests / CI (not a reference setting)."""
    return Config(
        {
            "N": 16,
            "M": 24,
            "slice_num": 2,
            "context_window": 5,
            "slice_ch": [8, 16],
            "quant": "ste",
        }
    )
