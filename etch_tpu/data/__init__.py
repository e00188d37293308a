from etch_tpu.data.mesh import (  # noqa: F401
    TriMesh,
    load_obj,
    save_obj,
    load_ply,
    save_ply,
    save_points_with_color,
    save_points_with_vector,
)
from etch_tpu.data.sampling import sample_surface  # noqa: F401
