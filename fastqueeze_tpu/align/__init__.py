from fastqueeze_tpu.align.ref import RefSeq, load_fasta
from fastqueeze_tpu.align.index import RefIndex, build_index, load_index
