from occlusionfusion_tpu.geometry.so3 import (
    hat,
    vee,
    so3_exp,
    so3_log,
    quaternion_to_matrix,
    matrix_to_quaternion,
    se3_exp,
)
from occlusionfusion_tpu.geometry.kabsch import kabsch, weighted_kabsch
from occlusionfusion_tpu.geometry.camera import (
    Intrinsics,
    backproject_depth,
    project_points,
)
from occlusionfusion_tpu.geometry.edwarp import ed_warp, ed_warp_normals
from occlusionfusion_tpu.geometry.skinning import skinning_weights
