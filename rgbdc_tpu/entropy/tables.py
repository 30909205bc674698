"""Quantized-CDF table construction (host-side, runs once per `update()`).

Equivalent of the reference's update() paths:
  - GaussianConditional.update (entropy_models.py:511-532): 64 CDFs out to
    ±ceil(6.1·sigma), erfc-based pmf, tail mass folded into an escape symbol.
  - EntropyBottleneck.update (entropy_models.py:320-360): per-channel pmf from
    the monotone MLP CDF evaluated at integer offsets around the median.
  - pmf_to_quantized_cdf (cpp_exts/ops/ops.cpp:24-81): integer CDF at 2^16
    with frequency-stealing; reimplemented in C (coder lib) with this numpy
    mirror used for tests and as fallback.

Tables live on the host as numpy — they are consumed only by the C rANS coder.
"""

from dataclasses import dataclass

import numpy as np
from scipy.special import erfc  # scipy ships with the baked-in stack
from scipy.stats import norm

from .bottleneck import logits_cumulative_np


@dataclass
class CdfTable:
    """Ragged set of quantized CDFs in a dense [n, max_len+2] int32 matrix."""

    cdf: np.ndarray  # int32 [n, max_cdf_len]
    cdf_length: np.ndarray  # int32 [n]  (= pmf_length + 2)
    offset: np.ndarray  # int32 [n]

    def __post_init__(self):
        self.cdf = np.ascontiguousarray(self.cdf, dtype=np.int32)
        self.cdf_length = np.ascontiguousarray(self.cdf_length, dtype=np.int32)
        self.offset = np.ascontiguousarray(self.offset, dtype=np.int32)


def pmf_to_quantized_cdf_py(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Quantize a pmf to an integer CDF summing to 2^precision.

    Bit-for-bit mirror of the reference C++ (ops.cpp:24-81): round to the
    grid, renormalize with 64-bit integer scaling, prefix-sum, then steal
    frequency from the lowest-freq symbol to remove zero-width entries.
    """
    pmf = np.asarray(pmf, dtype=np.float32)
    n = pmf.shape[0]
    cdf = np.zeros(n + 1, dtype=np.uint32)
    cdf[1:] = np.round(pmf.astype(np.float64) * (1 << precision)).astype(np.uint32)
    total = int(cdf.sum())
    if total == 0:
        raise ValueError("pmf sums to zero")
    cdf = ((np.uint64(1 << precision) * cdf.astype(np.uint64)) // np.uint64(total)).astype(
        np.uint32
    )
    cdf = np.cumsum(cdf, dtype=np.uint32)
    cdf[-1] = 1 << precision

    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            # steal from the smallest >1-frequency symbol
            freqs = cdf[1:] - cdf[:-1]
            candidates = np.where(freqs > 1)[0]
            if candidates.size == 0:
                raise ValueError("cannot fix zero-frequency symbol")
            best = candidates[np.argmin(freqs[candidates])]
            if best < i:
                cdf[best + 1 : i + 1] -= 1
            else:
                cdf[i + 1 : best + 1] += 1

    return cdf.astype(np.int32)


def _pmf_set_to_table(
    pmf: np.ndarray, tail_mass: np.ndarray, pmf_length: np.ndarray, precision: int
) -> np.ndarray:
    """Stack ragged pmfs (+escape tail) into a dense quantized-CDF matrix.

    Uses the C quantizer (identical semantics, ~100x faster for the long
    wide-sigma rows); pmf_to_quantized_cdf_py is the tested mirror."""
    try:
        from ..coder.rans import pmf_to_quantized_cdf as quantize_cdf
    except Exception:  # pragma: no cover — no compiler available
        quantize_cdf = pmf_to_quantized_cdf_py
    n = pmf.shape[0]
    max_length = int(pmf_length.max())
    cdf = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        prob = np.concatenate([pmf[i, : pmf_length[i]], tail_mass[i : i + 1]])
        _c = quantize_cdf(np.ascontiguousarray(prob, dtype=np.float32), precision)
        cdf[i, : _c.shape[0]] = _c
    return cdf


def build_gaussian_tables(
    scale_table: np.ndarray, tail_mass: float = 1e-9, precision: int = 16
) -> CdfTable:
    """CDF per scale-table entry, support ±ceil(sigma * Phi^-1(1-tail/2))."""
    scale_table = np.asarray(scale_table, dtype=np.float64)
    multiplier = -norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.int64)[None, :] - pmf_center[:, None]
    ).astype(np.float64)
    sigma = scale_table[:, None]

    def std_cum(x):
        return 0.5 * erfc(-(2**-0.5) * x)

    upper = std_cum((0.5 - samples) / sigma)
    lower = std_cum((-0.5 - samples) / sigma)
    pmf = (upper - lower).astype(np.float32)
    tail = (2 * lower[:, :1]).astype(np.float32).reshape(-1)

    cdf = _pmf_set_to_table(pmf, tail, pmf_length, precision)
    return CdfTable(cdf=cdf, cdf_length=pmf_length + 2, offset=-pmf_center)


def build_bottleneck_tables(
    eb_params: dict, n_filters: int = 4, precision: int = 16,
    margin: int | None = None,
) -> tuple[CdfTable, np.ndarray]:
    """Per-channel CDFs from an EntropyBottleneck param dict.

    Returns (table, medians[C]) — medians are needed by compress/decompress
    to re-center symbols the same way update() centered the pmfs.

    ``margin`` (env RGBDC_EB_MARGIN, default 2) widens the pmf support
    beyond the learned tail_mass quantiles by that many integer symbols per
    side, priced at the model's own density there (sub-1/2^16 mass rows
    get the freq-stealing floor of 1).  Rationale: the factorized prior
    under-fits its tails, so real latents at high rates land just outside
    the 1e-9 quantiles and divert to the ~36-bit escape sideband (428
    escapes/batch at q6, docs/PERF.md round 4); a 2-symbol margin codes
    them in-range at ~16 bits and keeps the sideband a true safety net
    (VERDICT r4 task 3).
    """
    import os

    if margin is None:
        margin = int(os.environ.get("RGBDC_EB_MARGIN", "2"))
    quantiles = np.asarray(eb_params["quantiles"], dtype=np.float64)  # [C,1,3]
    medians = quantiles[:, 0, 1]

    minima = np.clip(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32), 0, None)
    maxima = np.clip(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32), 0, None)
    minima += margin
    maxima += margin

    pmf_start = medians - minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float64)[None, None, :] + pmf_start[
        :, None, None
    ]  # [C,1,L]

    lower = logits_cumulative_np(eb_params, samples - 0.5, n_filters)
    upper = logits_cumulative_np(eb_params, samples + 0.5, n_filters)
    sign = -np.sign(lower + upper)

    def sigmoid(x):
        return np.where(x >= 0, 1.0 / (1.0 + np.exp(-x)), np.exp(x) / (1.0 + np.exp(x)))

    pmf = np.abs(sigmoid(sign * upper) - sigmoid(sign * lower))[:, 0, :].astype(
        np.float32
    )
    tail = (sigmoid(lower[:, 0, 0]) + sigmoid(-upper[:, 0, -1])).astype(np.float32)

    cdf = _pmf_set_to_table(pmf, tail, pmf_length, precision)
    return CdfTable(cdf=cdf, cdf_length=pmf_length + 2, offset=-minima), medians
