from .checkerboard import LightWeightCheckerboard
from .codec import CheckerboardCodec
from .elic import LightWeightELIC
from .elic_codec import ElicCodec
from .hyres import HyresCodec, ResidualJPEGCompression

__all__ = [
    "CheckerboardCodec",
    "ElicCodec",
    "HyresCodec",
    "LightWeightCheckerboard",
    "LightWeightELIC",
    "ResidualJPEGCompression",
]
