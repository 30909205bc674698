from .gaussian import (
    gaussian_likelihood,
    gaussian_forward,
    build_indexes,
    get_scale_table,
    SCALE_BOUND,
    LIKELIHOOD_BOUND,
)
from .bottleneck import EntropyBottleneck
from .tables import (
    CdfTable,
    pmf_to_quantized_cdf_py,
    build_gaussian_tables,
    build_bottleneck_tables,
)

__all__ = [
    "gaussian_likelihood",
    "gaussian_forward",
    "build_indexes",
    "get_scale_table",
    "SCALE_BOUND",
    "LIKELIHOOD_BOUND",
    "EntropyBottleneck",
    "CdfTable",
    "pmf_to_quantized_cdf_py",
    "build_gaussian_tables",
    "build_bottleneck_tables",
]
