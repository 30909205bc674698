"""Golden numerical parity vs the reference PyTorch implementation.

SURVEY §4(b): fixed-seed tensors through the reference's own torch modules
(CPU) and through the flax rebuild with CONVERTED weights must agree — per
transform block to <=1e-5, entropy-model likelihoods to <=1e-6, and the
full ELIC_united forward bpp estimate to +-0.1%.  Any mis-wired stride,
padding, activation, or concat order fails these tests.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_compat import (  # noqa: E402
    RefConfig,
    ensure_reference_importable,
    nchw,
    nhwc,
)

from rgbdc_tpu.utils import torch_import as ti  # noqa: E402

ensure_reference_importable()

import modules.transform as rmt  # noqa: E402  (reference)
import torch.nn as tnn  # noqa: E402

import rgbdc_tpu.nn as onn  # noqa: E402

RNG = np.random.default_rng(0)
TOL = 1e-5


def _x(shape):
    return RNG.normal(size=shape).astype(np.float32)


def _run_ref(tm, *xs):
    tm.eval()
    with torch.no_grad():
        out = tm(*[nchw(x) for x in xs])
    if isinstance(out, tuple):
        return tuple(nhwc(o) for o in out)
    return nhwc(out)


def _run_flax(module, params, *xs):
    out = module.apply({"params": params}, *[jnp.asarray(x) for x in xs])
    if isinstance(out, tuple):
        return tuple(np.asarray(o) for o in out)
    return np.asarray(out)


def _assert_close(a, b, tol=TOL, what=""):
    if isinstance(a, tuple):
        for i, (x, y) in enumerate(zip(a, b)):
            np.testing.assert_allclose(x, y, atol=tol, rtol=0, err_msg=f"{what}[{i}]")
    else:
        np.testing.assert_allclose(a, b, atol=tol, rtol=0, err_msg=what)


class TestTransformBlocks:
    def test_analysis_ex(self):
        tm = rmt.AnalysisTransformEX(N=16, M=24, ch=3, act=tnn.ReLU)
        fm = onn.AnalysisTransformEX(N=16, M=24)
        x = _x((1, 64, 64, 3))
        _assert_close(
            _run_flax(fm, ti.analysis_ex_p(tm), x), _run_ref(tm, x), what="g_a"
        )

    def test_synthesis_ex(self):
        tm = rmt.SynthesisTransformEX(N=16, M=24, ch=3, act=tnn.ReLU)
        fm = onn.SynthesisTransformEX(N=16, M=24, out_ch=3)
        x = _x((1, 8, 8, 24))
        _assert_close(
            _run_flax(fm, ti.synthesis_ex_p(tm), x), _run_ref(tm, x), what="g_s"
        )

    def test_hyper_analysis_ex(self):
        tm = rmt.HyperAnalysisEX(N=16, M=24, act=tnn.ReLU)
        fm = onn.HyperAnalysisEX(N=16, M=24)
        x = _x((1, 16, 16, 24))
        _assert_close(
            _run_flax(fm, ti.hyper_analysis_ex_p(tm), x), _run_ref(tm, x), what="h_a"
        )

    def test_hyper_synthesis_ex(self):
        tm = rmt.HyperSynthesisEX(N=16, M=24, act=tnn.ReLU)
        fm = onn.HyperSynthesisEX(N=16, M=24)
        x = _x((1, 4, 4, 16))
        _assert_close(
            _run_flax(fm, ti.hyper_synthesis_ex_p(tm), x), _run_ref(tm, x), what="h_s"
        )

    def test_bi_spf(self):
        tm = rmt.bi_spf(16)
        fm = onn.attention.BiSPF(16)
        r, d = _x((1, 64, 64, 16)), _x((1, 64, 64, 16))
        _assert_close(
            _run_flax(fm, ti.bi_spf_p(tm), r, d), _run_ref(tm, r, d), what="bi_spf"
        )

    def test_channel_context_ex(self):
        tm = rmt.ChannelContextEX(in_dim=32, out_dim=16, act=tnn.ReLU)
        fm = onn.ChannelContextEX(16)
        x = _x((1, 8, 8, 32))
        _assert_close(
            _run_flax(fm, ti.channel_context_ex_p(tm), x), _run_ref(tm, x),
            what="channel_ctx",
        )

    def test_entropy_parameters_ex(self):
        tm = rmt.EntropyParametersEX(in_dim=96, out_dim=16, act=tnn.ReLU)
        fm = onn.EntropyParametersEX(16, act=jax.nn.relu)
        x = _x((1, 8, 8, 96))
        _assert_close(
            _run_flax(fm, ti.entropy_parameters_ex_p(tm), x), _run_ref(tm, x),
            what="entropy_params_ex",
        )

    def test_entropy_parameters_plain(self):
        from modules.transform.entropy import EntropyParameters as RefEP

        tm = RefEP(in_dim=48, out_dim=24, act=tnn.ReLU)
        fm = onn.EntropyParameters(24)
        x = _x((1, 8, 8, 48))
        _assert_close(
            _run_flax(fm, ti.entropy_parameters_p(tm), x), _run_ref(tm, x),
            what="entropy_params",
        )

    def test_analysis_excross(self):
        tm = rmt.AnalysisTransformEXcross(N=16, M=24, act=tnn.ReLU)
        fm = onn.AnalysisTransformEXcross(N=16, M=24)
        r, d = _x((1, 128, 128, 3)), _x((1, 128, 128, 1))
        _assert_close(
            _run_flax(fm, ti.analysis_excross_p(tm), r, d), _run_ref(tm, r, d),
            what="g_a_cross",
        )

    def test_synthesis_excross(self):
        tm = rmt.SynthesisTransformEXcross(N=16, M=24, act=tnn.ReLU)
        fm = onn.SynthesisTransformEXcross(N=16, M=24)
        r, d = _x((1, 8, 8, 24)), _x((1, 8, 8, 24))
        _assert_close(
            _run_flax(fm, ti.synthesis_excross_p(tm), r, d), _run_ref(tm, r, d),
            what="g_s_cross",
        )

    def test_hyper_synthesis_excross(self):
        tm = rmt.HyperSynthesisEXcross(N=16, M=24, act=tnn.ReLU)
        fm = onn.HyperSynthesisEXcross(N=16, M=24)
        r, d = _x((1, 4, 4, 16)), _x((1, 4, 4, 16))
        _assert_close(
            _run_flax(fm, ti.hyper_synthesis_excross_p(tm), r, d),
            _run_ref(tm, r, d),
            what="h_s_cross",
        )


class TestEntropyModels:
    def test_gaussian_conditional_likelihood(self):
        """erfc likelihood vs reference entropy_models.py:489-550."""
        from compressai.entropy_models import GaussianConditional

        from rgbdc_tpu.entropy import gaussian_likelihood

        gc = GaussianConditional(None)
        y = _x((1, 8, 16, 16)) * 5
        sc = np.abs(_x((1, 8, 16, 16))) * 3 + 0.05  # below bound too
        mn = _x((1, 8, 16, 16))
        with torch.no_grad():
            ref = gc._likelihood(
                torch.from_numpy(y), torch.from_numpy(sc), torch.from_numpy(mn)
            )
            ref = gc.likelihood_lower_bound(ref).numpy()
        ours = np.asarray(
            gaussian_likelihood(jnp.asarray(y), jnp.asarray(sc), jnp.asarray(mn))
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=0)

    def test_build_indexes(self):
        from compressai.entropy_models import GaussianConditional

        from rgbdc_tpu.entropy import build_indexes, get_scale_table

        table = get_scale_table()
        gc = GaussianConditional(None)
        gc.update_scale_table([float(s) for s in table])
        sc = np.abs(_x((1, 4, 8, 8))) * 100 + 0.01
        ref = gc.build_indexes(torch.from_numpy(sc)).numpy()
        ours = np.asarray(build_indexes(jnp.asarray(sc), table)).astype(np.int64)
        np.testing.assert_array_equal(ours, ref)

    def test_entropy_bottleneck_likelihood(self):
        """factorized-prior likelihood vs reference entropy_models.py:369-428
        with CONVERTED weights, at eval (round) quantization."""
        from compressai.entropy_models import EntropyBottleneck as RefEB

        from rgbdc_tpu.entropy import EntropyBottleneck

        teb = RefEB(8)
        # randomize the MLP so the test is not at the symmetric init point
        with torch.no_grad():
            for i in range(5):
                getattr(teb, f"_matrix{i}").add_(
                    torch.randn_like(getattr(teb, f"_matrix{i}")) * 0.1
                )
                getattr(teb, f"_bias{i}").add_(
                    torch.randn_like(getattr(teb, f"_bias{i}")) * 0.1
                )
        teb.eval()
        feb = EntropyBottleneck(channels=8)
        params = ti.entropy_bottleneck_p(teb)
        z = _x((2, 8, 4, 4)) * 4
        with torch.no_grad():
            z_hat_ref, lik_ref = teb(torch.from_numpy(z))
        z_hat, lik = feb.apply(
            {"params": params}, jnp.asarray(z.transpose(0, 2, 3, 1)), training=False
        )
        np.testing.assert_allclose(
            np.asarray(z_hat), nhwc(z_hat_ref), atol=1e-5, rtol=0
        )
        np.testing.assert_allclose(np.asarray(lik), nhwc(lik_ref), atol=1e-6, rtol=0)


class TestFullModelParity:
    def test_elic_united_forward_bpp(self):
        """Converted reference weights through the flax ELIC_united: eval
        forward must reproduce x_hat (<=1e-4) and the bpp estimate to
        +-0.1% (BASELINE parity bar)."""
        import models as ref_models

        from rgbdc_tpu.models import ELICUnited

        cfg = RefConfig(
            N=32, M=48, slice_num=3, slice_ch=[8, 16, 24], quant="ste",
            context_window=5,
        )
        tm = ref_models.modelZoo["ELIC_united"](cfg)
        tm.eval()
        fm = ELICUnited(N=32, M=48, slice_ch=(8, 16, 24))
        params = ti.elic_united_params(tm)

        rgb = RNG.uniform(size=(1, 128, 128, 3)).astype(np.float32)
        depth = RNG.uniform(size=(1, 128, 128, 1)).astype(np.float32)
        with torch.no_grad():
            ref = tm(nchw(rgb), nchw(depth))
        out = fm.apply({"params": params}, jnp.asarray(rgb), jnp.asarray(depth),
                       training=False)

        np.testing.assert_allclose(
            np.asarray(out["x_hat"]["r"]), nhwc(ref["x_hat"]["r"]), atol=1e-4,
            rtol=0, err_msg="rgb x_hat",
        )
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]["d"]), nhwc(ref["x_hat"]["d"]), atol=1e-4,
            rtol=0, err_msg="depth x_hat",
        )

        def bpp_ref(liks):
            total = 0.0
            for v in liks.values():
                total += float(torch.log2(v).sum())
            return -total / (128 * 128)

        def bpp_ours(liks):
            total = 0.0
            for v in liks.values():
                total += float(jnp.sum(jnp.log2(v)))
            return -total / (128 * 128)

        for mod, ref_key in (("r", "r_likelihoods"), ("d", "d_likelihoods")):
            b_ref = bpp_ref(ref[ref_key])
            b_ours = bpp_ours(out[f"{mod}_likelihoods"])
            assert abs(b_ours - b_ref) / b_ref < 1e-3, (mod, b_ours, b_ref)
