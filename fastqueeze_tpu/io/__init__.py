from fastqueeze_tpu.io.fastq import (  # noqa: F401
    FastqBlock, open_maybe_gz, parse_block, read_blocks, assemble_block)
