from .cdf import pmf_to_quantized_cdf
from .rans import BufferedRansEncoder, RansDecoder, RansEncoder

__all__ = [
    "BufferedRansEncoder",
    "RansDecoder",
    "RansEncoder",
    "pmf_to_quantized_cdf",
]
