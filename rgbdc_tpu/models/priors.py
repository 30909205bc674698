"""Classic learned-compression priors (the CompressAI model zoo layer).

Functional parity with reference CompressAI/compressai/models/priors.py:
  - FactorizedPrior (:109-168): g_a/g_s conv+GDN, factorized latent
  - ScaleHyperprior (:181-283): hyper net predicts sigma only (zero-mean)
  - MeanScaleHyperprior (:286-349): hyper predicts (sigma, mu)
  - JointAutoregressiveHierarchicalPriors (:352-583): adds a PixelCNN-style
    masked-conv spatial context.  Its decode is pixel-serial by construction
    (reference runs a python loop per pixel, :553-583); JointARCodec below
    implements the real host-serial compress/decompress (reference
    _compress_ar :482-518 / _decompress_ar :553-583) with a pure-numpy
    per-pixel pipeline shared by encoder and decoder (bit-exact closure by
    construction).  It is correct, not fast — the checkerboard codecs
    (models/elic.py etc.) are this framework's deployable AR family.

All NHWC; compress/decompress for the dense (non-AR) models use the same
batched rANS host path as the main codecs.
"""

from __future__ import annotations

import flax.linen as nn
from ..nn.layers import conv1x1
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, build_indexes, gaussian_forward, gaussian_likelihood
from ..ops.gdn import GDN
from ..ops import quantize_ste


def _conv(ch, k=5, s=2):
    return nn.Conv(ch, (k, k), strides=(s, s), padding="SAME")


def _deconv(ch, k=5, s=2):
    return nn.ConvTranspose(ch, (k, k), strides=(s, s), padding="SAME")


class MaskedConv2D(nn.Module):
    """PixelCNN masked conv (reference compressai/layers/layers.py:21-47).
    mask_type 'A': strictly-causal (excludes center); 'B': includes it."""

    features: int
    kernel: int = 5
    mask_type: str = "A"

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = np.ones((k, k, 1, 1), np.float32)
        center = k // 2
        mask[center, center + (1 if self.mask_type == "B" else 0) :] = 0
        mask[center + 1 :] = 0
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            x, kernel * jnp.asarray(mask), (1, 1), "SAME", dimension_numbers=dn
        )
        return out + bias


class FactorizedPrior(nn.Module):
    N: int = 128
    M: int = 192
    in_ch: int = 3

    def setup(self):
        n, m = self.N, self.M
        self.g_a = nn.Sequential(
            [_conv(n), GDN(n), _conv(n), GDN(n), _conv(n), GDN(n), _conv(m)]
        )
        self.g_s = nn.Sequential(
            [
                _deconv(n), GDN(n, inverse=True),
                _deconv(n), GDN(n, inverse=True),
                _deconv(n), GDN(n, inverse=True),
                _deconv(self.in_ch),
            ]
        )
        self.entropy_bottleneck = EntropyBottleneck(channels=m)

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        y_hat, y_lik = self.entropy_bottleneck(y, training=training)
        return {"x_hat": self.g_s(y_hat), "likelihoods": {"y": y_lik}}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class ScaleHyperprior(nn.Module):
    """Ballé 2018: hyperprior predicts sigma; latent modeled zero-mean."""

    N: int = 128
    M: int = 192
    in_ch: int = 3
    mean_scale: bool = False

    def setup(self):
        n, m = self.N, self.M
        self.g_a = nn.Sequential(
            [_conv(n), GDN(n), _conv(n), GDN(n), _conv(n), GDN(n), _conv(m)]
        )
        self.g_s = nn.Sequential(
            [
                _deconv(n), GDN(n, inverse=True),
                _deconv(n), GDN(n, inverse=True),
                _deconv(n), GDN(n, inverse=True),
                _deconv(self.in_ch),
            ]
        )
        if self.mean_scale:
            # MeanScaleHyperprior wiring (priors.py:293-319)
            self.h_a = nn.Sequential(
                [
                    _conv(n, 3, 1), jax.nn.leaky_relu,
                    _conv(n), jax.nn.leaky_relu, _conv(n),
                ]
            )
            self.h_s = nn.Sequential(
                [
                    _deconv(m), jax.nn.leaky_relu,
                    _deconv(m * 3 // 2), jax.nn.leaky_relu,
                    _deconv(2 * m, 3, 1),
                ]
            )
        else:
            self.h_a = nn.Sequential(
                [
                    lambda x: jnp.abs(x),
                    _conv(n, 3, 1), jax.nn.relu,
                    _conv(n), jax.nn.relu, _conv(n),
                ]
            )
            self.h_s = nn.Sequential(
                [_deconv(n), jax.nn.relu, _deconv(n), jax.nn.relu,
                 _deconv(m, 3, 1), jax.nn.relu]
            )
        self.entropy_bottleneck = EntropyBottleneck(channels=n)

    def _params(self, z_hat):
        p = self.h_s(z_hat)
        if self.mean_scale:
            return jnp.split(p, 2, axis=-1)
        return p, None

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, training=training)
        scales, means = self._params(z_hat)
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), y.shape, minval=-0.5, maxval=0.5
            )
            y_hat = y + noise
        else:
            y_hat = jnp.round(y - (0 if means is None else means)) + (
                0 if means is None else means
            )
        y_lik = gaussian_likelihood(y_hat, scales, means)
        return {"x_hat": self.g_s(y_hat), "likelihoods": {"y": y_lik, "z": z_lik}}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # dense (non-AR) codec surface: one coding group for the whole latent
    def encode_front(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians()
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return y, z_sym

    def hyper_decode(self, z_sym):
        medians = self.entropy_bottleneck.medians()
        return self._params(z_sym.astype(jnp.float32) + medians)

    def latent_params(self, hyper, scale_table):
        scales, means = hyper
        if means is None:
            means = jnp.zeros_like(scales)
        return build_indexes(scales, scale_table), means

    def synthesize(self, y_hat):
        return self.g_s(y_hat)


class MeanScaleHyperprior(ScaleHyperprior):
    mean_scale: bool = True


class JointAutoregressiveHierarchicalPriors(nn.Module):
    """Minnen 2018: mean-scale hyperprior + masked-conv spatial context.
    Estimation forward only (decode is inherently pixel-serial)."""

    N: int = 192
    M: int = 192
    in_ch: int = 3

    def setup(self):
        n, m = self.N, self.M
        self.g_a = nn.Sequential(
            [_conv(n), GDN(n), _conv(n), GDN(n), _conv(n), GDN(n), _conv(m)]
        )
        self.g_s = nn.Sequential(
            [
                _deconv(n), GDN(n, inverse=True),
                _deconv(n), GDN(n, inverse=True),
                _deconv(n), GDN(n, inverse=True),
                _deconv(self.in_ch),
            ]
        )
        self.h_a = nn.Sequential(
            [_conv(n, 3, 1), jax.nn.leaky_relu, _conv(n), jax.nn.leaky_relu, _conv(n)]
        )
        self.h_s = nn.Sequential(
            [_deconv(m), jax.nn.leaky_relu, _deconv(m * 3 // 2), jax.nn.leaky_relu,
             _deconv(2 * m, 3, 1)]
        )
        self.context_prediction = MaskedConv2D(2 * self.M, 5, "A")
        self.entropy_parameters = nn.Sequential(
            [
                conv1x1(self.M * 10 // 3), jax.nn.leaky_relu,
                conv1x1(self.M * 8 // 3), jax.nn.leaky_relu,
                conv1x1(self.M * 6 // 3),
            ]
        )
        self.entropy_bottleneck = EntropyBottleneck(channels=n)

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, training=training)
        hyper = self.h_s(z_hat)
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), y.shape, minval=-0.5, maxval=0.5
            )
            y_hat = y + noise
        else:
            y_hat = jnp.round(y)
        ctx = self.context_prediction(y_hat)
        params = self.entropy_parameters(jnp.concatenate([hyper, ctx], axis=-1))
        scales, means = jnp.split(params, 2, axis=-1)
        # rate at the quantized latent (noise in training, round at eval)
        y_lik = gaussian_forward(
            y, scales, means, training,
            self.make_rng("noise") if training else None,
        )[1]
        return {"x_hat": self.g_s(y_hat), "likelihoods": {"y": y_lik, "z": z_lik}}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # codec stage surface (driven by JointARCodec)
    def encode_front(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians()
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return y, z_sym

    def hyper_decode(self, z_sym):
        medians = self.entropy_bottleneck.medians()
        return self.h_s(z_sym.astype(jnp.float32) + medians)

    def synthesize(self, y_hat):
        return self.g_s(y_hat)


class HyperpriorCodec:
    """Dense compress/decompress for the (Mean)ScaleHyperprior family:
    the whole latent is one coding group (no spatial/channel AR)."""

    def __init__(self, model, variables, tables=None):
        from .codec import CodecTables

        self.model = model
        self.variables = variables
        self.tables = tables if tables is not None else CodecTables.build(variables)
        # numpy (STATIC) so build_indexes can unroll its compare-sum;
        # 63 floats inline into the HLO as constants
        st = np.asarray(self.tables.scale_table, dtype=np.float32)
        mt = type(model)
        self._encode_front = jax.jit(
            lambda v, x: model.apply(v, x, method=mt.encode_front)
        )
        self._hyper = jax.jit(lambda v, z: model.apply(v, z, method=mt.hyper_decode))
        self._params = jax.jit(
            lambda v, hyper: model.apply(v, hyper, st, method=mt.latent_params)
        )
        self._synth = jax.jit(lambda v, y: model.apply(v, y, method=mt.synthesize))

    def compress(self, x) -> dict:
        from ..coder.registry import entropy_coder_classes
        from .codec import _tmap, eb_channel_indexes

        RansEncoder, _ = entropy_coder_classes()

        v = self.variables
        y, z_sym_dev = self._encode_front(v, x)
        hyper = self._hyper(v, z_sym_dev)
        indexes, means = self._params(v, hyper)
        sym = jnp.clip(jnp.round(y - means), -30000, 30000).astype(jnp.int16)
        sym, indexes, z_sym = jax.device_get((sym, indexes, z_sym_dev))
        b = z_sym.shape[0]
        z_idx = eb_channel_indexes(z_sym.shape)
        eb_table = self.tables.eb["entropy_bottleneck"]

        def encode_one(n):
            enc = RansEncoder()
            enc.buffer(sym[n], indexes[n], self.tables.gc)
            enc_z = RansEncoder()
            enc_z.buffer(z_sym[n], z_idx[n], eb_table)
            return enc.flush(), enc_z.flush()

        pairs = _tmap(encode_one, b)
        return {
            "strings": [[p[0] for p in pairs], [p[1] for p in pairs]],
            "shape": (z_sym.shape[1], z_sym.shape[2]),
        }

    def decompress(self, strings, shape) -> dict:
        from ..coder.registry import entropy_coder_classes
        from .codec import _tmap, eb_channel_indexes

        _, RansDecoder = entropy_coder_classes()

        v = self.variables
        y_strings, z_strings = strings
        b = len(y_strings)
        zh, zw = shape
        z_idx = eb_channel_indexes((b, zh, zw, self.model.N))
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_sym = np.stack(
            _tmap(lambda n: RansDecoder(z_strings[n]).decode(z_idx[n], eb_table), b)
        )
        hyper = self._hyper(v, jnp.asarray(z_sym))
        indexes, means = self._params(v, hyper)
        idx_np = np.asarray(indexes)
        sym = np.stack(
            _tmap(
                lambda n: RansDecoder(y_strings[n]).decode(idx_np[n], self.tables.gc),
                b,
            )
        )
        y_hat = jnp.asarray(sym).astype(jnp.float32) + means
        return {"x_hat": self._synth(v, y_hat), "y_hat": y_hat}


class JointARCodec:
    """Real pixel-serial codec for JointAutoregressiveHierarchicalPriors
    (reference priors.py:451-583).

    The per-pixel pipeline (masked 5x5 context conv + the three 1x1
    entropy-parameter convs + quantize) runs in float32 NUMPY on the host,
    and the exact same routine drives both compress and decompress — the
    decoder's reconstructed context buffer therefore matches the encoder's
    bit for bit (the role cudnn.determinism + CPU-only inference plays in
    the reference).  Device does g_a/h_a/h_s/g_s; the AR loop is O(H*W)
    python — correctness-first, like the reference's own warning says.
    """

    def __init__(self, model, variables, tables=None):
        from .codec import CodecTables

        self.model = model
        self.variables = variables
        self.tables = tables if tables is not None else CodecTables.build(variables)
        mt = type(model)
        self._front = jax.jit(lambda v, x: model.apply(v, x, method=mt.encode_front))
        self._hyper = jax.jit(lambda v, z: model.apply(v, z, method=mt.hyper_decode))
        self._synth = jax.jit(lambda v, y: model.apply(v, y, method=mt.synthesize))

        p = variables["params"]
        k = np.asarray(p["context_prediction"]["kernel"], np.float32)  # [5,5,M,2M]
        mask = np.ones((5, 5, 1, 1), np.float32)
        mask[2, 2:] = 0
        mask[3:] = 0
        self._ctx_kernel = k * mask
        self._ctx_bias = np.asarray(p["context_prediction"]["bias"], np.float32)
        ep = p["entropy_parameters"]
        self._ep = [
            (
                np.asarray(ep[f"layers_{i}"]["kernel"], np.float32)[0, 0],
                np.asarray(ep[f"layers_{i}"]["bias"], np.float32),
            )
            for i in (0, 2, 4)
        ]
        st = self.tables.scale_table.astype(np.float32)
        self._st_edges = st[:-1]

    # -- shared per-pixel routine (encoder AND decoder) ----------------------

    def _pixel_params(self, buf, hyper_px, h, w):
        """(scales, means) [M] at pixel (h, w) from the padded buffer."""
        crop = buf[h : h + 5, w : w + 5, :]
        ctx = (
            np.einsum("hwc,hwco->o", crop, self._ctx_kernel, dtype=np.float32)
            + self._ctx_bias
        )
        f = np.concatenate([hyper_px, ctx]).astype(np.float32)
        for i, (wgt, b) in enumerate(self._ep):
            f = f @ wgt + b
            if i < 2:
                f = np.where(f >= 0, f, 0.01 * f).astype(np.float32)  # leaky_relu
        scales, means = np.split(f, 2)
        idx = np.searchsorted(
            self._st_edges, np.maximum(scales, 0.11), side="left"
        ).astype(np.int32)
        return idx, means.astype(np.float32)

    def compress(self, x) -> dict:
        from ..coder.registry import entropy_coder_classes
        from .codec import eb_channel_indexes

        RansEncoder, _ = entropy_coder_classes()

        v = self.variables
        y, z_sym_dev = self._front(v, x)
        hyper = self._hyper(v, z_sym_dev)
        y, hyper, z_sym = jax.device_get((y, hyper, z_sym_dev))
        b, hgt, wid, m = y.shape
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes(z_sym.shape)

        y_strings, z_strings, y_hats = [], [], []
        for i in range(b):
            # reference pads the ORIGINAL y; the masked kernel hides the
            # not-yet-coded (future) positions (priors.py:473,494-513)
            buf = np.pad(y[i], ((2, 2), (2, 2), (0, 0))).astype(np.float32)
            syms, idxs = [], []
            for h in range(hgt):
                for w in range(wid):
                    idx, means = self._pixel_params(buf, hyper[i, h, w], h, w)
                    sym = np.round(y[i, h, w] - means).astype(np.int32)
                    buf[h + 2, w + 2] = sym.astype(np.float32) + means
                    syms.append(sym)
                    idxs.append(idx)
            enc = RansEncoder()
            enc.buffer(np.concatenate(syms), np.concatenate(idxs), self.tables.gc)
            y_strings.append(enc.flush())
            enc_z = RansEncoder()
            enc_z.buffer(z_sym[i], z_idx[i], eb_table)
            z_strings.append(enc_z.flush())
            y_hats.append(buf[2:-2, 2:-2])
        return {
            "strings": [y_strings, z_strings],
            "shape": (z_sym.shape[1], z_sym.shape[2]),
            # the decoder must regenerate this buffer bit for bit
            "y_hat": np.stack(y_hats),
        }

    def decompress(self, strings, shape) -> dict:
        from ..coder.registry import entropy_coder_classes
        from .codec import eb_channel_indexes

        _, RansDecoder = entropy_coder_classes()

        v = self.variables
        y_strings, z_strings = strings
        b = len(y_strings)
        zh, zw = shape
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes((b, zh, zw, self.model.N))
        z_sym = np.stack(
            [
                RansDecoder(z_strings[i]).decode(z_idx[i], eb_table)
                for i in range(b)
            ]
        )
        hyper = np.asarray(self._hyper(v, jnp.asarray(z_sym)))
        hgt, wid = zh * 4, zw * 4
        m = self.model.M

        y_hats = []
        for i in range(b):
            dec = RansDecoder(y_strings[i])
            buf = np.zeros((hgt + 4, wid + 4, m), np.float32)
            for h in range(hgt):
                for w in range(wid):
                    idx, means = self._pixel_params(buf, hyper[i, h, w], h, w)
                    sym = dec.decode(idx, self.tables.gc).astype(np.float32)
                    buf[h + 2, w + 2] = sym + means
            y_hats.append(buf[2:-2, 2:-2])
        y_hat = jnp.asarray(np.stack(y_hats))
        x_hat = jnp.clip(self._synth(v, y_hat), 0.0, 1.0)
        return {"x_hat": x_hat, "y_hat": y_hat}
