from fastqueeze_tpu.models.base import (  # noqa: F401
    CtxModel, FlatModel, Order1ByteModel, SeqModel, QualModel,
    seq_model_from_params, qual_model_from_params, qual_model_for,
    byte_model, flag_model,
)
