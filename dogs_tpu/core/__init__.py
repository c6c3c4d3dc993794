from dogs_tpu.core.camera import Camera, look_at_camera, make_camera
from dogs_tpu.core.gaussians import (
    GaussianParams,
    empty_params,
    inverse_sigmoid,
    pad_to_capacity,
    round_up_capacity,
)
from dogs_tpu.core.knn import mean_knn_dist_sq
from dogs_tpu.core.sh import eval_sh, num_sh_bases, rgb_to_sh, sh_to_rgb
from dogs_tpu.core.transforms import (
    build_covariance_3d,
    normalize,
    quat_multiply,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
)
