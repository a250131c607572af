from hortimapping_tpu.parallel.sharding import (
    fruit_mesh,
    pad_to_multiple,
    shard_joint_opt,
)

__all__ = ["fruit_mesh", "pad_to_multiple", "shard_joint_opt"]
