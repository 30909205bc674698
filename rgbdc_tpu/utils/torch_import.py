"""Reference (PyTorch) state -> flax params converters.

Golden-parity infrastructure: each function maps a REFERENCE torch module
instance (built from /root/reference's own code on CPU) to the parameter
tree of the corresponding rgbdc_tpu flax module, so fixed-seed inputs can
be pushed through both implementations and compared (SURVEY §4(b)).

Conventions (pinned empirically, see tests/test_golden_parity.py):
  * torch Conv2d weight [out, in, kh, kw] -> flax Conv kernel
    [kh, kw, in, out]  (transpose 2,3,1,0)
  * torch ConvTranspose2d weight [in, out, kh, kw] -> flax
    ConvTranspose(transpose_kernel=True) kernel [kh, kw, out, in]
    (transpose 2,3,1,0 — note torch's dim0 is IN for transposed convs)
  * torch Linear weight [out, in] -> flax Dense kernel [in, out]
  * GDN beta/gamma: stored reparametrized values copy verbatim (identical
    sqrt reparameterization, ops/gdn.py vs compressai parametrizers.py)
  * EntropyBottleneck: _matrixK/_biasK/_factorK and quantiles copy
    verbatim (same shapes per channel).
"""

from __future__ import annotations

import numpy as np


def _t2n(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def conv_p(tc) -> dict:
    p = {"kernel": _t2n(tc.weight).transpose(2, 3, 1, 0)}
    if tc.bias is not None:
        p["bias"] = _t2n(tc.bias)
    return p


def deconv_p(tc) -> dict:
    p = {"kernel": _t2n(tc.weight).transpose(2, 3, 1, 0)}
    if tc.bias is not None:
        p["bias"] = _t2n(tc.bias)
    return p


def dense_p(tl) -> dict:
    p = {"kernel": _t2n(tl.weight).T}
    if getattr(tl, "bias", None) is not None:
        p["bias"] = _t2n(tl.bias)
    return p


def gdn_p(tg) -> dict:
    return {"beta": _t2n(tg.beta), "gamma": _t2n(tg.gamma)}


def residual_bottleneck_p(tm) -> dict:
    """reference modules/layers/res_blk.py ResidualBottleneck."""
    out = {
        "Conv_0": conv_p(tm.branch[0]),
        "Conv_1": conv_p(tm.branch[2]),
        "Conv_2": conv_p(tm.branch[4]),
    }
    if tm.skip is not None:
        out["Conv_3"] = conv_p(tm.skip)
    return out


def _residual_unit_p(tu) -> dict:
    return {
        "Conv_0": conv_p(tu.conv[0]),
        "Conv_1": conv_p(tu.conv[2]),
        "Conv_2": conv_p(tu.conv[4]),
    }


def attention_block_p(tm) -> dict:
    """compressai AttentionBlock -> flax AttentionBlock (layers.py)."""
    out = {}
    for i in range(3):
        out[f"_ResidualUnit_{i}"] = _residual_unit_p(tm.conv_a[i])
    for i in range(3):
        out[f"_ResidualUnit_{i + 3}"] = _residual_unit_p(tm.conv_b[i])
    out["Conv_0"] = conv_p(tm.conv_b[3])
    return out


def se_block_p(tm) -> dict:
    return {"Dense_0": dense_p(tm.fc[0]), "Dense_1": dense_p(tm.fc[2])}


def esa_p(tm) -> dict:
    return {
        "Conv_0": conv_p(tm.conv1),
        "Conv_1": conv_p(tm.conv2),
        "Conv_2": conv_p(tm.conv_max),
        "Conv_3": conv_p(tm.conv3),
        "Conv_4": conv_p(tm.conv3_),
        "Conv_5": conv_p(tm.conv_f),
        "Conv_6": conv_p(tm.conv4),
    }


def bi_spf_p(tm) -> dict:
    out = {
        "r_ext": conv_p(tm.r_ext),
        "d_ext": conv_p(tm.d_ext),
        "d_esa": esa_p(tm.d_esa),
    }
    if hasattr(tm, "r_esa"):
        out["r_esa"] = esa_p(tm.r_esa)
    return out


def channel_context_ex_p(tm) -> dict:
    return {
        "Conv_0": conv_p(tm.fushion[0]),
        "Conv_1": conv_p(tm.fushion[2]),
        "Conv_2": conv_p(tm.fushion[4]),
    }


def entropy_parameters_ex_p(tm) -> dict:
    return {
        "SEBlock_0": se_block_p(tm.se),
        "Conv_0": conv_p(tm.fusion[0]),
        "Conv_1": conv_p(tm.fusion[2]),
        "Conv_2": conv_p(tm.fusion[4]),
    }


def entropy_parameters_p(tm) -> dict:
    """plain EntropyParameters (reference entropy.py:7-29): 3x 1x1 convs."""
    return {
        "Conv_0": conv_p(tm.fusion[0]),
        "Conv_1": conv_p(tm.fusion[2]),
        "Conv_2": conv_p(tm.fusion[4]),
    }


def analysis_ex_p(tm) -> dict:
    """AnalysisTransformEX Sequential indices -> flax auto-names."""
    s = tm.analysis_transform
    out = {
        "Conv_0": conv_p(s[0]),
        "Conv_1": conv_p(s[4]),
        "AttentionBlock_0": attention_block_p(s[8]),
        "Conv_2": conv_p(s[9]),
        "Conv_3": conv_p(s[13]),
        "AttentionBlock_1": attention_block_p(s[14]),
    }
    rb_src = [1, 2, 3, 5, 6, 7, 10, 11, 12]
    for k, i in enumerate(rb_src):
        out[f"ResidualBottleneck_{k}"] = residual_bottleneck_p(s[i])
    return out


def synthesis_ex_p(tm) -> dict:
    """SynthesisTransformEX Sequential indices -> flax auto-names."""
    s = tm.synthesis_transform
    out = {
        "AttentionBlock_0": attention_block_p(s[0]),
        "ConvTranspose_0": deconv_p(s[1]),
        "ConvTranspose_1": deconv_p(s[5]),
        "AttentionBlock_1": attention_block_p(s[6]),
        "ConvTranspose_2": deconv_p(s[10]),
        "ConvTranspose_3": deconv_p(s[14]),
    }
    rb_src = [2, 3, 4, 7, 8, 9, 11, 12, 13]
    for k, i in enumerate(rb_src):
        out[f"ResidualBottleneck_{k}"] = residual_bottleneck_p(s[i])
    return out


def hyper_analysis_ex_p(tm) -> dict:
    s = tm.reduction
    return {"Conv_0": conv_p(s[0]), "Conv_1": conv_p(s[2]), "Conv_2": conv_p(s[4])}


def hyper_synthesis_ex_p(tm) -> dict:
    s = tm.increase
    return {
        "ConvTranspose_0": deconv_p(s[0]),
        "ConvTranspose_1": deconv_p(s[2]),
        "ConvTranspose_2": deconv_p(s[4]),
    }


def entropy_bottleneck_p(tm) -> dict:
    """compressai EntropyBottleneck learned-prior params (verbatim copy)."""
    out = {"quantiles": _t2n(tm.quantiles)}
    for i in range(len(tm.filters) + 1):
        out[f"matrix_{i}"] = _t2n(getattr(tm, f"_matrix{i}"))
        out[f"bias_{i}"] = _t2n(getattr(tm, f"_bias{i}"))
        if i < len(tm.filters):
            out[f"factor_{i}"] = _t2n(getattr(tm, f"_factor{i}"))
    return out


def analysis_excross_p(tm) -> dict:
    """AnalysisTransformEXcross: zipped dual Sequential + 3 bi_spf -> flax
    AnalysisTransformEXcross auto-names (see nn/analysis.py call order)."""
    r, d = tm.rgb_analysis_transform, tm.depth_analysis_transform
    out = {
        "Conv_0": conv_p(r[0]),  # rgb in-conv
        "Conv_1": conv_p(d[0]),  # depth in-conv
    }
    # per stage: 3 rgb RBs, 3 depth RBs, (stage1: 2 attn), BiSPF, 2 convs
    rb_flax = 0
    conv_flax = 2
    bispf_flax = 0
    attn_flax = 0
    stages = [(1, 4, 5), (6, 10, 11), (12, 15, 16)]  # (rb_start, spf_idx, conv_idx)
    for si, (rb0, spf, cv) in enumerate(stages):
        for k in range(3):
            out[f"ResidualBottleneck_{rb_flax}"] = residual_bottleneck_p(r[rb0 + k])
            rb_flax += 1
        for k in range(3):
            out[f"ResidualBottleneck_{rb_flax}"] = residual_bottleneck_p(d[rb0 + k])
            rb_flax += 1
        if si == 1:
            out[f"AttentionBlock_{attn_flax}"] = attention_block_p(r[9])
            out[f"AttentionBlock_{attn_flax + 1}"] = attention_block_p(d[9])
            attn_flax += 2
        out[f"BiSPF_{bispf_flax}"] = bi_spf_p(r[spf])
        bispf_flax += 1
        out[f"Conv_{conv_flax}"] = conv_p(r[cv])
        out[f"Conv_{conv_flax + 1}"] = conv_p(d[cv])
        conv_flax += 2
    out[f"AttentionBlock_{attn_flax}"] = attention_block_p(r[17])
    out[f"AttentionBlock_{attn_flax + 1}"] = attention_block_p(d[17])
    return out


def hyper_analysis_excross_p(tm) -> dict:
    def seq(s):
        return {"Conv_0": conv_p(s[0]), "Conv_1": conv_p(s[2]), "Conv_2": conv_p(s[4])}

    return {
        "rgb_reduction": seq(tm.rgb_reduction),
        "depth_reduction": seq(tm.depth_reduction),
    }


def synthesis_excross_p(tm) -> dict:
    """SynthesisTransformEXcross zipped dual Sequential -> flax auto-names
    (see nn/synthesis.py call order)."""
    r, d = tm.rgb_synthesis_transform, tm.depth_synthesis_transform
    out = {
        "AttentionBlock_0": attention_block_p(r[0]),
        "AttentionBlock_1": attention_block_p(d[0]),
        "AttentionBlock_2": attention_block_p(r[7]),
        "AttentionBlock_3": attention_block_p(d[7]),
        "ConvTranspose_0": deconv_p(r[1]),
        "ConvTranspose_1": deconv_p(d[1]),
        "ConvTranspose_2": deconv_p(r[6]),
        "ConvTranspose_3": deconv_p(d[6]),
        "ConvTranspose_4": deconv_p(r[12]),
        "ConvTranspose_5": deconv_p(d[12]),
        "ConvTranspose_6": deconv_p(r[17]),
        "ConvTranspose_7": deconv_p(d[17]),
        "BiSPF_0": bi_spf_p(r[2]),
        "BiSPF_1": bi_spf_p(r[8]),
        "BiSPF_2": bi_spf_p(r[13]),
    }
    rb = 0
    for base in (3, 9, 14):
        for k in range(3):
            out[f"ResidualBottleneck_{rb}"] = residual_bottleneck_p(r[base + k])
            out[f"ResidualBottleneck_{rb + 1}"] = residual_bottleneck_p(d[base + k])
            rb += 2
    return out


def _hyper_transform_block_p(tm) -> dict:
    return {"SEBlock_0": se_block_p(tm.se), "ConvTranspose_0": deconv_p(tm.deconv)}


def hyper_synthesis_excross_p(tm) -> dict:
    return {
        name: _hyper_transform_block_p(getattr(tm, name))
        for name in ("r_h_s1", "r_h_s2", "r_h_s3", "d_h_s1", "d_h_s2", "d_h_s3")
    }


def local_context_p(tc) -> dict:
    """reference per-slice 5x5 local-context conv -> flax LocalContext5x5."""
    return {"Conv_0": conv_p(tc)}


def elic_params(tm) -> dict:
    """Full reference ELIC -> flax ELIC param tree."""
    out = {
        "g_a": analysis_ex_p(tm.g_a),
        "g_s": synthesis_ex_p(tm.g_s),
        "h_a": hyper_analysis_ex_p(tm.h_a),
        "h_s": hyper_synthesis_ex_p(tm.h_s),
        "entropy_bottleneck": entropy_bottleneck_p(tm.entropy_bottleneck),
    }
    for i in range(len(tm.local_context)):
        out[f"local_context_{i}"] = local_context_p(tm.local_context[i])
        out[f"entropy_parameters_anchor_{i}"] = entropy_parameters_p(
            tm.entropy_parameters_anchor[i]
        )
        out[f"entropy_parameters_nonanchor_{i}"] = entropy_parameters_p(
            tm.entropy_parameters_nonanchor[i]
        )
        if i:
            out[f"channel_context_{i}"] = channel_context_ex_p(tm.channel_context[i])
    return out


def elic_united_params(tm) -> dict:
    """Full reference ELIC_united -> flax ELICUnited param tree."""
    out = {
        "g_a": analysis_excross_p(tm.g_a),
        "g_s": synthesis_excross_p(tm.g_s),
        "h_a": hyper_analysis_excross_p(tm.h_a),
        "h_s": hyper_synthesis_excross_p(tm.h_s),
        "rgb_entropy_bottleneck": entropy_bottleneck_p(tm.rgb_entropy_bottleneck),
        "depth_entropy_bottleneck": entropy_bottleneck_p(tm.depth_entropy_bottleneck),
    }
    n = len(tm.rgb_local_context)
    for i in range(n):
        out[f"rgb_local_context_{i}"] = local_context_p(tm.rgb_local_context[i])
        out[f"rgb_local_context_full_{i}"] = local_context_p(
            tm.rgb_local_context_anchor_with_nonanchor[i]
        )
        out[f"depth_local_context_{i}"] = local_context_p(tm.depth_local_context[i])
        out[f"rgb_ep_anchor_{i}"] = entropy_parameters_ex_p(
            tm.rgb_entropy_parameters_anchor[i]
        )
        out[f"depth_ep_anchor_{i}"] = entropy_parameters_ex_p(
            tm.depth_entropy_parameters_anchor[i]
        )
        out[f"rgb_ep_nonanchor_{i}"] = entropy_parameters_ex_p(
            tm.rgb_entropy_parameters_nonanchor[i]
        )
        out[f"depth_ep_nonanchor_{i}"] = entropy_parameters_ex_p(
            tm.depth_entropy_parameters_nonanchor[i]
        )
        if i:
            out[f"rgb_channel_context_{i}"] = channel_context_ex_p(
                tm.rgb_channel_context[i]
            )
            out[f"depth_channel_context_{i}"] = channel_context_ex_p(
                tm.depth_channel_context[i]
            )
    return out
