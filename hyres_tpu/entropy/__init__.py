from .bottleneck import CdfTables, EntropyBottleneck, build_bottleneck_tables
from .bound import LIKELIHOOD_BOUND, lower_bound
from .gaussian import (
    SCALES_LEVELS,
    SCALES_MAX,
    SCALES_MIN,
    build_gaussian_tables,
    build_indexes,
    dequantize,
    gaussian_likelihood,
    get_scale_table,
    quantize_noise,
    quantize_ste,
    quantize_symbols,
)

__all__ = [
    "CdfTables",
    "EntropyBottleneck",
    "LIKELIHOOD_BOUND",
    "SCALES_LEVELS",
    "SCALES_MAX",
    "SCALES_MIN",
    "build_bottleneck_tables",
    "build_gaussian_tables",
    "build_indexes",
    "dequantize",
    "gaussian_likelihood",
    "get_scale_table",
    "lower_bound",
    "quantize_noise",
    "quantize_ste",
    "quantize_symbols",
]
