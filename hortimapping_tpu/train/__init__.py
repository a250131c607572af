"""TPU-native DeepSDF training (the reference ships pretrained decoders
only — no trainer anywhere in its tree; see SURVEY.md 'Scale and language')."""

from hortimapping_tpu.train.deepsdf import (  # noqa: F401
    TrainResult,
    load_sdf_samples,
    train_deepsdf,
)
