"""3-D reconstruction metrics (reference: `/root/reference/metrics_3d/`)."""

from hortimapping_tpu.metrics.chamfer import ChamferDistance, nn_distances_tpu
from hortimapping_tpu.metrics.metric import Metrics3D
from hortimapping_tpu.metrics.precision_recall import PrecisionRecall

__all__ = ["ChamferDistance", "PrecisionRecall", "Metrics3D", "nn_distances_tpu"]
