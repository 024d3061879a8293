"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from fastqueeze_tpu.models.base import QualModel
from fastqueeze_tpu.ops import engine
from fastqueeze_tpu.parallel.mesh import (
    encode_blocks_sharded, make_mesh, train_counts_sharded)

import __graft_entry__ as graft


def test_devices_available():
    assert len(jax.devices()) == 8


def test_graft_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)


def test_sharded_training_matches_single_device():
    """The mesh-trained frozen table must equal the single-device one."""
    import jax.numpy as jnp
    model = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=2)
    B, T, L = 4, 64, 32
    syms, valid, pos = graft._example_grids(B=B, T=T, L=L,
                                            qmax=model.alphabet - 1)
    mesh = make_mesh(4, ctx_shards=1)
    sharded = train_counts_sharded(mesh, model, jnp.asarray(syms),
                                   jnp.asarray(valid),
                                   {"pos": jnp.asarray(pos)})
    # single-device reference: flatten blocks into one histogram
    single = engine._train_counts(
        model, jnp.asarray(syms.reshape(B * T, L)),
        jnp.asarray(valid.reshape(B * T, L)),
        {"pos": jnp.asarray(pos.reshape(B * T, L)),
         "start": jnp.asarray(pos.reshape(B * T, L) == 0)})
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))
