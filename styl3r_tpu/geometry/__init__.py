from .gaussians import Gaussians, build_covariance, quat_to_rotmat
from .projection import (
    get_fov,
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    project,
    sample_image_grid,
    unproject,
)
from .se3 import (
    camera_normalization,
    se3_exp,
    so3_exp,
    update_pose,
)

__all__ = [
    "Gaussians",
    "build_covariance",
    "quat_to_rotmat",
    "get_fov",
    "get_world_rays",
    "homogenize_points",
    "homogenize_vectors",
    "project",
    "sample_image_grid",
    "unproject",
    "camera_normalization",
    "se3_exp",
    "so3_exp",
    "update_pose",
]
from .ptc_geometry import (
    depthmap_to_absolute_camera_coordinates,
    depthmap_to_camera_coordinates,
    geotrf,
    get_joint_pointcloud_center_scale,
    get_joint_pointcloud_depth,
    normalize_pointcloud,
)
