"""Loss semantics tests, including a torch cross-check against the exact
reference formulas (torch CPU is available in the image)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.training import losses


def test_dice_perfect_prediction():
    # logits hugely confident + correct -> dice -> -1
    target = jnp.asarray(np.random.RandomState(0).randint(0, 3, (2, 8, 8)))
    logits = jax.nn.one_hot(target, 3) * 100.0
    l = losses.memory_efficient_soft_dice_loss(logits, target, smooth=1e-5,
                                               batch_dice=True, do_bg=False)
    assert float(l) < -0.999


def test_dice_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")
    b, c, h, w = 3, 4, 9, 11
    logits = rng.randn(b, c, h, w).astype(np.float32)
    target = rng.randint(0, c, (b, h, w))

    # ---- torch reference (MemoryEfficientSoftDiceLoss math) ----
    x = torch.softmax(torch.from_numpy(logits), 1)[:, 1:]
    y_onehot = torch.zeros((b, c, h, w))
    y_onehot.scatter_(1, torch.from_numpy(target)[:, None], 1)
    y_onehot = y_onehot[:, 1:]
    axes = (2, 3)
    intersect = (x * y_onehot).sum(axes).sum(0)
    sum_pred = x.sum(axes).sum(0)
    sum_gt = y_onehot.sum(axes).sum(0)
    smooth = 1e-5
    dc = (2 * intersect + smooth) / torch.clip(sum_gt + sum_pred + smooth, 1e-8)
    expected = -dc.mean().item()

    got = losses.memory_efficient_soft_dice_loss(
        jnp.asarray(np.moveaxis(logits, 1, -1)), jnp.asarray(target),
        batch_dice=True, do_bg=False, smooth=smooth,
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_ce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.randn(2, 5, 7, 7).astype(np.float32)
    target = rng.randint(0, 5, (2, 7, 7))
    expected = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(target)
    ).item()
    got = losses.robust_cross_entropy_loss(
        jnp.asarray(np.moveaxis(logits, 1, -1)), jnp.asarray(target)
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_ignore_label_masks_loss(rng):
    c = 3
    logits = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
    target = jnp.asarray(rng.randint(0, c, (2, 8, 8)))
    # set half the voxels to ignore (c is the ignore label)
    ignore_mask = rng.rand(2, 8, 8) > 0.5
    target_ig = jnp.where(jnp.asarray(ignore_mask), c, target)
    l_ig = losses.dc_and_ce_loss(logits, target_ig, batch_dice=True, ignore_label=c)
    assert np.isfinite(float(l_ig))
    # all-ignored: loss must be well-defined (CE skipped)
    all_ig = jnp.full_like(target, c)
    l_all = losses.dc_and_ce_loss(logits, all_ig, batch_dice=True, ignore_label=c)
    assert np.isfinite(float(l_all))


def test_dc_and_bce_regions(rng):
    logits = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    target = jnp.asarray((rng.rand(2, 8, 8, 2) > 0.5).astype(np.float32))
    l = losses.dc_and_bce_loss(logits, target, batch_dice=True)
    assert np.isfinite(float(l))
    # with ignore channel appended
    ig = jnp.asarray((rng.rand(2, 8, 8, 1) > 0.8).astype(np.float32))
    t3 = jnp.concatenate([target, ig], -1)
    l2 = losses.dc_and_bce_loss(logits, t3, batch_dice=True, use_ignore_label=True)
    assert np.isfinite(float(l2))


def test_deep_supervision_weights():
    w = losses.deep_supervision_weights(5)
    assert len(w) == 5
    np.testing.assert_allclose(sum(w), 1.0, rtol=1e-6)
    assert w[0] > w[1] > w[2]


def test_downsample_seg_for_ds(rng):
    seg = jnp.asarray(rng.randint(0, 4, (2, 16, 16)))
    scales = [[1.0, 1.0], [0.5, 0.5], [0.25, 0.25]]
    out = losses.downsample_seg_for_ds(seg, scales)
    assert out[0].shape == (2, 16, 16)
    assert out[1].shape == (2, 8, 8)
    assert out[2].shape == (2, 4, 4)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(seg)[:, ::2, ::2])


def test_batch_dice_equals_global_reduction_on_mesh(rng):
    """Global batch-dice under sharding == single-device result (replaces the
    reference's AllGatherGrad correctness requirement)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices("cpu")[:8])
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(devices, ("data",))
    logits = jnp.asarray(rng.randn(8, 6, 6, 3).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 3, (8, 6, 6)))

    def loss(lg, tg):
        return losses.memory_efficient_soft_dice_loss(lg, tg, batch_dice=True,
                                                      do_bg=False)

    single = float(loss(logits, target))
    sharding = NamedSharding(mesh, P("data"))
    lg_s = jax.device_put(logits, sharding)
    tg_s = jax.device_put(target, sharding)
    sharded = float(jax.jit(loss)(lg_s, tg_s))
    np.testing.assert_allclose(sharded, single, rtol=1e-5)
