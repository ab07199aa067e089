"""Multi-chip sliding-window inference: tile batches sharded over the mesh
must reproduce the single-device result exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.inference.sliding_window import VolumePredictor
from mlagg_unet_tpu.parallel.mesh import get_data_mesh


def _echo_net(variables, x):
    return jnp.concatenate([x[..., :1], -x[..., :1]], axis=-1)


def test_sharded_matches_single(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = get_data_mesh(8)
    data = rng.rand(1, 48, 40).astype(np.float32)

    vp_single = VolumePredictor(_echo_net, {}, (32, 32), 2, (0, 1),
                                tile_batch_size=2)
    vp_sharded = VolumePredictor(_echo_net, {}, (32, 32), 2, (0, 1),
                                 tile_batch_size=2, mesh=mesh)
    out_single = vp_single(data)
    out_sharded = vp_sharded(data)
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-5)
    np.testing.assert_allclose(out_single[0], data[0], atol=1e-4)


def test_sharded_2d_over_3d(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = get_data_mesh(8)
    data = rng.rand(2, 4, 40, 36).astype(np.float32)

    def const_net(variables, x):
        B = x.shape[0]
        return jnp.full((B, *x.shape[1:-1], 3), 2.5, jnp.float32)

    vp = VolumePredictor(const_net, {}, (32, 32), 3, (0,),
                         tile_batch_size=2, mesh=mesh)
    out = vp(data)
    assert out.shape == (3, 4, 40, 36)
    np.testing.assert_allclose(out, 2.5, rtol=1e-5)
