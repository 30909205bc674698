from .layers import (
    conv,
    deconv,
    conv1x1,
    conv3x3,
    subpel_conv3x3,
    ResidualBottleneck,
    ResidualBlock,
    ResidualBlockWithStride,
    ResidualBlockUpsample,
    AttentionBlock,
)
from .attention import ESA, SEBlock, BiSPF, BiSPFSingle
from .analysis import (
    AnalysisTransformEX,
    AnalysisTransformEXcross,
    AnalysisTransformEXSingle,
    HyperAnalysisEX,
    HyperAnalysisEXcross,
)
from .synthesis import (
    SynthesisTransformEX,
    SynthesisTransformEXcross,
    SynthesisTransformEXSingle,
    HyperSynthesisEX,
    HyperSynthesisEXcross,
    HyperSynthesisEXSingle,
)
from .context import ChannelContextEX, LocalContext5x5
from .entropy_params import EntropyParameters, EntropyParametersEX

__all__ = [
    "conv", "deconv", "conv1x1", "conv3x3", "subpel_conv3x3",
    "ResidualBottleneck", "ResidualBlock", "ResidualBlockWithStride",
    "ResidualBlockUpsample", "AttentionBlock",
    "ESA", "SEBlock", "BiSPF", "BiSPFSingle",
    "AnalysisTransformEX", "AnalysisTransformEXcross", "AnalysisTransformEXSingle",
    "HyperAnalysisEX", "HyperAnalysisEXcross",
    "SynthesisTransformEX", "SynthesisTransformEXcross", "SynthesisTransformEXSingle",
    "HyperSynthesisEX", "HyperSynthesisEXcross", "HyperSynthesisEXSingle",
    "ChannelContextEX", "LocalContext5x5",
    "EntropyParameters", "EntropyParametersEX",
]
