from .checkerboard import LightWeightCheckerboard
from .codec import CheckerboardCodec

__all__ = [
    "CheckerboardCodec",
    "LightWeightCheckerboard",
]
