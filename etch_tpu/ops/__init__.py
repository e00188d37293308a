from etch_tpu.ops.knn import knn  # noqa: F401
from etch_tpu.ops.fps import fps  # noqa: F401
from etch_tpu.ops.ball_query import ball_query  # noqa: F401
from etch_tpu.ops.grouping import (group_points, group_points_transposed,  # noqa: F401
                                   gather_points)
from etch_tpu.ops.interpolate import knn_interpolate  # noqa: F401
from etch_tpu.ops.neighbor_ops import (  # noqa: F401
    neighbor_aggregation,
    neighbor_subtraction,
)
from etch_tpu.ops.point_mesh import point_mesh_distance  # noqa: F401
