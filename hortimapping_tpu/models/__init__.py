from hortimapping_tpu.models.decoder import (
    DecoderSpec,
    decoder_apply,
    decoder_sdf,
    decoder_sdf_and_input_grad,
    init_decoder_params,
)
from hortimapping_tpu.models.workspace import (
    config_decoder,
    load_latent_vectors,
    load_specs,
    convert_torch_checkpoint,
    save_native_checkpoint,
    load_native_checkpoint,
)
