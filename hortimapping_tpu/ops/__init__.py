from hortimapping_tpu.ops.lie import (
    exp_se3,
    exp_sim3,
    exp_sim3_ref,
    points_to_pose_jacobian_se3,
    points_to_pose_jacobian_sim3,
    rotation_matrix_to_angle,
    axis_angle_to_rotation_matrix,
    skew,
)
from hortimapping_tpu.ops.robust import huber_weights, robust_residuals
from hortimapping_tpu.ops.sdf import sdf_to_occupancy, sdf_to_occupancy_log
