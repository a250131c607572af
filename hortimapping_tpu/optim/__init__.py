from hortimapping_tpu.optim.state import FruitObservations, OptState, OptResult
from hortimapping_tpu.optim.lm import (
    lm_iteration,
    shape_pose_joint_opt,
    shape_pose_joint_opt_batched,
    shape_opt_deepsdf,
)
