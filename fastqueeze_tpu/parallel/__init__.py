from fastqueeze_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, train_counts_sharded, encode_blocks_sharded)
