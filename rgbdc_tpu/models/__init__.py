"""Codec zoo + registry.

Reference registry (models/__init__.py:11-20) maps model-name substrings to
classes, ordered so the longest match wins. Same contract here.
"""

import dataclasses

from .elic import ELIC
from .elic_united import ELICUnited, ELICUnitedR2D
from .cheng_ckbd import (
    Cheng2020Anchor,
    Cheng2020AnchorCheckerboard,
    Cheng2020Attention,
)
from .stf import SymmetricalTransFormer
from .stf_united import STFUnited
from .elic_master import ELICMaster
from .mlicpp import MLICPlusPlus
from .codec import ChannelARCodec, CodecTables, ElicCodec, MasterCodec, MlicCodec, UnitedCodec

# ordered: longest/most-specific substring first (reference models/__init__.py:10)
modelZoo = {
    "ckbd": Cheng2020AnchorCheckerboard,
    "ELIC_united_R2D": ELICUnitedR2D,
    "ELIC_united": ELICUnited,
    "ELIC_master": ELICMaster,
    "ELIC": ELIC,
    "STF_united": STFUnited,
    "STF": SymmetricalTransFormer,
    "MLIC": MLICPlusPlus,
}


def get_model_cls(name: str):
    for key, cls in modelZoo.items():
        if key in name:
            return cls
    raise KeyError(f"no model matching '{name}' (zoo: {list(modelZoo)})")


def build_model(name: str, config, in_ch: int | None = None):
    """Instantiate a zoo model from a config dict, passing only the fields
    the model's dataclass accepts (models differ: ckbd has no M/slices).
    Fields a model pins (cls.PINNED_CONFIG) keep the class defaults — the
    reference's STF_united constructor force-overrides slice_ch/N/M on
    whatever config it receives (models/stf_united.py:639-641)."""
    cls = get_model_cls(name)
    fields = {f.name for f in dataclasses.fields(cls)}
    pinned = set(getattr(cls, "PINNED_CONFIG", ()))
    kwargs = {}
    for key in ("N", "M", "quant"):
        if key in fields and key in config and key not in pinned:
            kwargs[key] = config[key]
    if "slice_ch" in fields and "slice_ch" in config and "slice_ch" not in pinned:
        kwargs["slice_ch"] = tuple(config["slice_ch"])
    if "slice_num" in fields and "slice_num" in config and "slice_num" not in pinned:
        kwargs["slice_num"] = config["slice_num"]
    if "in_ch" in fields and in_ch is not None:
        kwargs["in_ch"] = in_ch
    return cls(**kwargs)


__all__ = [
    "ELIC",
    "ELICUnited",
    "ELICUnitedR2D",
    "Cheng2020Anchor",
    "Cheng2020AnchorCheckerboard",
    "Cheng2020Attention",
    "SymmetricalTransFormer",
    "STFUnited",
    "ELICMaster",
    "MasterCodec",
    "MLICPlusPlus",
    "MlicCodec",
    "ChannelARCodec",
    "ElicCodec",
    "UnitedCodec",
    "CodecTables",
    "modelZoo",
    "get_model_cls",
    "build_model",
]
