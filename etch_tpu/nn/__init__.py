from etch_tpu.nn.epn import EPNBackbone, SphericalCloud  # noqa: F401
from etch_tpu.nn.attention import StackedMHSA, BatchMLP  # noqa: F401
from etch_tpu.nn.point_transformer import (  # noqa: F401
    PointTransformerSeg,
    PointTransformerUNet,
)
