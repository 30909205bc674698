"""Context models for the slice-wise entropy coder.

  - ChannelContextEX (reference modules/transform/context.py:10-30):
    3x conv5 funnel in -> 224 -> 128 -> 2*slice_ch over previously decoded
    slices.
  - LocalContext5x5 (reference models/elic.py:32-35): one 5x5 stride-1 conv
    over the (masked) anchor plane producing 2*slice_ch spatial context for
    the non-anchor pass.
"""

from collections.abc import Callable

import flax.linen as nn
import jax

Act = Callable[[jax.Array], jax.Array]


class ChannelContextEX(nn.Module):
    out_dim: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(224, (5, 5), padding="SAME")(x)
        x = self.act(x)
        x = nn.Conv(128, (5, 5), padding="SAME")(x)
        x = self.act(x)
        x = nn.Conv(self.out_dim, (5, 5), padding="SAME")(x)
        return x


class LocalContext5x5(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_dim, (5, 5), padding="SAME")(x)
