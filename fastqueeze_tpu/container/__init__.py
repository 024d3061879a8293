from fastqueeze_tpu.container.encap import read_varint, write_varint, read_tlv, write_tlv  # noqa: F401
from fastqueeze_tpu.container.arcfile import ArcWriter, ArcReader, BlockInfo  # noqa: F401
