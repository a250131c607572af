from hortimapping_tpu.utils.misc import (
    Timer,
    get_time,
    set_random_seed,
    setup_wandb,
)

__all__ = ["Timer", "get_time", "set_random_seed", "setup_wandb"]
