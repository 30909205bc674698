"""Import helper for golden-parity tests: makes the PUBLIC reference
PyTorch code at /root/reference importable on CPU.

The vendored CompressAI imports two pybind11 extensions at package init
(compressai.ans, compressai._CXX) that are not built in this environment,
and the swin modules import timm; all three are stubbed here —
pmf_to_quantized_cdf is backed by OUR C implementation (coder/rans.py),
which doubles as a parity check of the table builder itself.

The reference tree is treated as UNTRUSTED DATA: we execute only the
model-definition modules, on CPU, inside the test process.
"""

from __future__ import annotations

import sys
import types

import numpy as np

_READY = False


def ensure_reference_importable() -> None:
    global _READY
    if _READY:
        return

    import torch
    import torch.nn as tnn

    if "compressai.ans" not in sys.modules:
        ans = types.ModuleType("compressai.ans")

        class _Unavailable:
            """Constructible (EntropyModel.__init__ instantiates coders
            eagerly); any actual coding call raises."""

            def __init__(self, *a, **k):
                pass

            def __getattr__(self, name):  # pragma: no cover
                raise RuntimeError("reference rANS extension is stubbed")

        ans.BufferedRansEncoder = _Unavailable
        ans.RansEncoder = _Unavailable
        ans.RansDecoder = _Unavailable
        sys.modules["compressai.ans"] = ans

    if "compressai._CXX" not in sys.modules:
        cxx = types.ModuleType("compressai._CXX")

        def _pmf_to_quantized_cdf(pmf, precision):
            from rgbdc_tpu.coder.rans import pmf_to_quantized_cdf

            return pmf_to_quantized_cdf(
                np.asarray(pmf, np.float32), precision
            ).tolist()

        cxx.pmf_to_quantized_cdf = _pmf_to_quantized_cdf
        sys.modules["compressai._CXX"] = cxx

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(t, std=0.02, **k):
            return tnn.init.trunc_normal_(t, std=std)

        tl.DropPath = DropPath
        tl.to_2tuple = to_2tuple
        tl.trunc_normal_ = trunc_normal_
        timm.models = tm
        tm.layers = tl
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tl

    for path in ("/root/reference/CompressAI", "/root/reference"):
        if path not in sys.path:
            sys.path.insert(0, path)
    _READY = True


class RefConfig(dict):
    """Mirror of the reference's Config (utils/IOutils.py:14-22)."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__


def nchw(x_nhwc: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def nhwc(t) -> np.ndarray:
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)
