from .rans import RansEncoder, RansDecoder, pmf_to_quantized_cdf, encode_with_tables
from .bitstream import write_body, read_body, write_uints, read_uints
from .registry import (
    available_entropy_coders,
    entropy_coder_classes,
    get_entropy_coder,
    register_entropy_coder,
    set_entropy_coder,
)

__all__ = [
    "RansEncoder",
    "RansDecoder",
    "pmf_to_quantized_cdf",
    "encode_with_tables",
    "write_body",
    "read_body",
    "write_uints",
    "read_uints",
    "available_entropy_coders",
    "entropy_coder_classes",
    "get_entropy_coder",
    "register_entropy_coder",
    "set_entropy_coder",
]
