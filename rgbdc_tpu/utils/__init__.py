from .config import Config, model_config, mlic_model_config, tiny_model_config

__all__ = ["Config", "model_config", "mlic_model_config", "tiny_model_config"]
