"""Codec zoo + registry.

Reference registry (models/__init__.py:11-20) maps model-name substrings to
classes, ordered so the longest match wins. Same contract here.
"""

from .elic import ELIC
from .elic_united import ELICUnited, ELICUnitedR2D
from .codec import CodecTables, ElicCodec, UnitedCodec

# ordered: longest/most-specific substring first (reference models/__init__.py:10)
modelZoo = {
    "ELIC_united_R2D": ELICUnitedR2D,
    "ELIC_united": ELICUnited,
    "ELIC": ELIC,
}


def get_model_cls(name: str):
    for key, cls in modelZoo.items():
        if key in name:
            return cls
    raise KeyError(f"no model matching '{name}' (zoo: {list(modelZoo)})")


__all__ = [
    "ELIC",
    "ELICUnited",
    "ElicCodec",
    "UnitedCodec",
    "CodecTables",
    "modelZoo",
    "get_model_cls",
]
