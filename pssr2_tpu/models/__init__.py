"""Model zoo: ResUNet(/A), RDResUNet(/A), SwinIR — flax NNX modules running
NHWC on TPU, with the reference's NCHW/[0,255] call convention at the API
boundary (reference: pssr/models/__init__.py).
"""

from .resunet import ResUNet, ResUNetA
from .rdresunet import RDResUNet, RDResUNetA
from .swinir import SwinIR

__all__ = ["ResUNet", "ResUNetA", "RDResUNet", "RDResUNetA", "SwinIR"]
