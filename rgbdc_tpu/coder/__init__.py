from .rans import RansEncoder, RansDecoder, pmf_to_quantized_cdf, encode_with_tables
from .bitstream import write_body, read_body, write_uints, read_uints

__all__ = [
    "RansEncoder",
    "RansDecoder",
    "pmf_to_quantized_cdf",
    "encode_with_tables",
    "write_body",
    "read_body",
    "write_uints",
    "read_uints",
]
