"""Entropy-coder backend registry.

Mirrors the reference's coder-selection surface
(CompressAI/compressai/__init__.py:22-62 set/get/available_entropy_coders
and entropy_models.py:20-57 _EntropyCoder): a process-global default
backend name, a registry of available backends, and a factory that
resolves a name to (encoder_cls, decoder_cls).

Built-in backends:
  * "rans"       — the native 64-bit rANS coder (coder/rans.py), always
                   available; byte-compatible with the reference "ans"
                   container semantics.
  * "rangecoder" — registered only if the optional `range_coder` package
                   is importable (it is not in this image), matching the
                   reference's conditional registration.

New backends register with `register_entropy_coder(name, factory)` where
factory() -> (encoder_cls, decoder_cls) with the RansEncoder/RansDecoder
interface (buffer/flush and decode(indexes, table)).
"""

from __future__ import annotations

from typing import Callable, Tuple

_BACKENDS: dict[str, Callable[[], Tuple[type, type]]] = {}
_DEFAULT = "rans"


def register_entropy_coder(name: str, factory: Callable[[], Tuple[type, type]]):
    _BACKENDS[name] = factory


def _rans_factory():
    from .rans import RansDecoder, RansEncoder

    return RansEncoder, RansDecoder


register_entropy_coder("rans", _rans_factory)

try:  # optional alternative backend, like the reference's range_coder gate
    import range_coder as _range_coder  # noqa: F401

    def _rangecoder_factory():  # pragma: no cover - package not in image
        return _range_coder.RangeEncoder, _range_coder.RangeDecoder

    register_entropy_coder("rangecoder", _rangecoder_factory)
except ImportError:
    pass


def available_entropy_coders() -> list[str]:
    """Names of usable backends (reference __init__.py:55-62)."""
    return sorted(_BACKENDS)


def get_entropy_coder() -> str:
    """Current default backend name (reference __init__.py:48-52)."""
    return _DEFAULT


def set_entropy_coder(name: str) -> None:
    """Set the process default (reference __init__.py:33-45)."""
    global _DEFAULT
    if name not in _BACKENDS:
        raise ValueError(
            f'Invalid entropy coder "{name}", choose from '
            f'({", ".join(available_entropy_coders())}).'
        )
    _DEFAULT = name


def entropy_coder_classes(name: str | None = None) -> Tuple[type, type]:
    """Resolve a backend name to (encoder_cls, decoder_cls)."""
    name = name or _DEFAULT
    if name not in _BACKENDS:
        raise ValueError(
            f'Unknown entropy coder "{name}" '
            f'(available: {", ".join(available_entropy_coders())})'
        )
    return _BACKENDS[name]()
