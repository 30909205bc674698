"""Entropy-parameter fusion heads -> (scales, means).

  - EntropyParameters (reference modules/transform/entropy.py:7-29):
    3x 1x1 conv funnel in -> out*5/3 -> out*4/3 -> out.
  - EntropyParametersEX (:56-78): SE residual gate on the input, then
    1x1 (in/6) -> 3x3 (out*4/3) -> 5x5 (out).
"""

from collections.abc import Callable

import flax.linen as nn
import jax

from ..ops.math import exact_gelu

from .attention import SEBlock
from .layers import conv1x1

Act = Callable[[jax.Array], jax.Array]


class EntropyParameters(nn.Module):
    out_dim: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        out = self.out_dim
        x = conv1x1(out * 5 // 3)(x)
        x = self.act(x)
        x = conv1x1(out * 4 // 3)(x)
        x = self.act(x)
        x = conv1x1(out)(x)
        return x


class EntropyParametersEX(nn.Module):
    out_dim: int
    act: Act = exact_gelu

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        x = x + SEBlock(in_dim)(x)
        x = conv1x1(in_dim // 6)(x)
        x = self.act(x)
        x = nn.Conv(self.out_dim * 4 // 3, (3, 3), padding="SAME")(x)
        x = self.act(x)
        x = nn.Conv(self.out_dim, (5, 5), padding="SAME")(x)
        return x
