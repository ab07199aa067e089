"""VMamba backbone/VM-UNet + cascade augmentation transforms."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_vss_block(rng):
    from mlagg_unet_tpu.models.vmamba import VSSBlock

    m = VSSBlock(d_state=4)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    v = m.init({"params": KEY, "dropout": KEY}, x)
    y = m.apply(v, x)
    assert y.shape == x.shape


def test_vmunet(rng):
    from mlagg_unet_tpu.models.vmamba import VMUNet

    m = VMUNet(num_classes=3, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
               d_state=4)
    x = jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32))
    v = m.init({"params": KEY, "dropout": KEY}, x)
    y = m.apply(v, x)
    assert y.shape == (1, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_move_seg_as_one_hot(rng):
    from mlagg_unet_tpu.data.augment import move_seg_as_one_hot_to_data

    data = rng.rand(1, 8, 8).astype(np.float32)
    seg = np.stack([
        rng.randint(0, 3, (8, 8)),
        rng.randint(0, 3, (8, 8)),
    ]).astype(np.int8)
    out_data, out_seg = move_seg_as_one_hot_to_data(data, seg, [1, 2])
    assert out_data.shape == (3, 8, 8)
    assert out_seg.shape == (1, 8, 8)
    np.testing.assert_array_equal(out_data[1], (seg[1] == 1))
    np.testing.assert_array_equal(out_data[2], (seg[1] == 2))


def test_cascade_binary_aug(rng):
    from mlagg_unet_tpu.data.augment import cascade_binary_aug

    data = np.zeros((3, 16, 16), np.float32)
    data[1, 4:12, 4:12] = 1
    data[2, 2:6, 2:6] = 1
    out = cascade_binary_aug(data.copy(), 2, np.random.RandomState(0),
                             p_binary=1.0, p_remove=0.0)
    # binary ops keep values binary
    assert set(np.unique(out[1])).issubset({0.0, 1.0})
    assert set(np.unique(out[2])).issubset({0.0, 1.0})


def test_training_transforms_cascaded(rng):
    from mlagg_unet_tpu.data.augment import TrainingTransforms

    tfs = TrainingTransforms(
        [16, 16], {"x": (-0.3, 0.3), "y": (0, 0), "z": (0, 0)},
        mirror_axes=(0, 1), is_cascaded=True, foreground_labels=[1, 2],
    )
    data = rng.rand(1, 24, 24).astype(np.float32)
    seg = np.stack([rng.randint(-1, 3, (24, 24)),
                    rng.randint(0, 3, (24, 24))]).astype(np.int8)
    out_data, out_seg = tfs(data, seg, np.random.RandomState(0))
    assert out_data.shape == (3, 16, 16)  # 1 image + 2 one-hot channels
    assert out_seg.shape == (1, 16, 16)
    assert out_seg.min() >= 0
