from etch_tpu.geometry.icosahedral import (  # noqa: F401
    get_anchors,
    get_intra_idx,
    get_face_normals,
    anchor_permutation,
)
from etch_tpu.geometry.kernel_points import get_kernel_points  # noqa: F401
from etch_tpu.geometry.so3 import (  # noqa: F401
    so3_mean,
    rodrigues,
    rotation_matrix_to_axis_angle,
)
