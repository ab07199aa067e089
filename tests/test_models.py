"""Model zoo shape/gradient tests (tiny configs for CPU speed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.models.mednext import (
    MedNeXtBlock,
    MedNeXtDownBlock,
    MedNeXtUpBlock,
    OutBlock,
    PatchExpand,
)
from mlagg_unet_tpu.models.mlla import AggregatedAttention, Attention, MLLABlock, MLLAEncoder
from mlagg_unet_tpu.models.mamba_skip import SS2DSkip, VSSConvLayer
from mlagg_unet_tpu.models.mlla_uper import MLLAUper
from mlagg_unet_tpu.models.unetr_blocks import UnetrBasicBlock, UnetrUpBlock


KEY = jax.random.PRNGKey(0)


def init_and_apply(module, *args, **kwargs):
    variables = module.init({"params": KEY, "dropout": KEY}, *args, **kwargs)
    out = module.apply(variables, *args, **kwargs)
    return variables, out


def test_mednext_block_shapes(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    _, y = init_and_apply(MedNeXtBlock(16, exp_r=2, kernel_size=3), x)
    assert y.shape == (2, 8, 8, 16)
    _, y = init_and_apply(MedNeXtDownBlock(32, exp_r=2), x)
    assert y.shape == (2, 4, 4, 32)
    _, y = init_and_apply(MedNeXtUpBlock(8, exp_r=2), x)
    assert y.shape == (2, 16, 16, 8)
    _, y = init_and_apply(PatchExpand(8), x)
    assert y.shape == (2, 16, 16, 8)


def test_aggregated_attention_local(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    _, y = init_and_apply(AggregatedAttention(num_heads=2, local=True), x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_aggregated_attention_pooled(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    _, y = init_and_apply(
        AggregatedAttention(num_heads=2, local=False, sr_ratio=4), x
    )
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_full_attention(rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))
    _, y = init_and_apply(Attention(num_heads=4), x)
    assert y.shape == x.shape


def test_mlla_block_both_paths(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    _, y = init_and_apply(MLLABlock(num_heads=4, sr_ratio=4, mlp_ratio=2), x)
    assert y.shape == x.shape
    _, y = init_and_apply(MLLABlock(num_heads=4, sr_ratio=1, mlp_ratio=2), x)
    assert y.shape == x.shape


def test_mlla_encoder_pyramid(rng):
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    enc = MLLAEncoder(patch_size=2, embed_dim=16, depths=(1, 1, 1, 1),
                      num_heads=(2, 2, 4, 4), mlp_ratio=2,
                      sr_ratio=(8, 4, 2, 2))
    _, outs = init_and_apply(enc, x)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 3)
    assert outs[1].shape == (1, 16, 16, 16)
    assert outs[2].shape == (1, 8, 8, 32)
    assert outs[3].shape == (1, 4, 4, 64)
    assert outs[4].shape == (1, 2, 2, 128)


def test_ss2d_skip_multiscale(rng):
    xs = [
        jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 2, 2, 8).astype(np.float32)),
    ]
    mod = SS2DSkip(d_model=8, d_state=4, stage_num=3)
    _, outs = init_and_apply(mod, xs)
    assert len(outs) == 3
    for o, x in zip(outs, xs):
        assert o.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(o)))


def test_vss_conv_layer(rng):
    dims = [16, 32, 64, 128]
    xs = [
        jnp.asarray(rng.randn(1, 16 // (2 ** i), 16 // (2 ** i), d).astype(np.float32))
        for i, d in enumerate(dims)
    ]
    mod = VSSConvLayer(feature_dims=dims, hidden_dim=8, depth=1, d_state=4)
    _, outs = init_and_apply(mod, xs)
    for o, x in zip(outs, xs):
        assert o.shape == x.shape


def test_unetr_blocks(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    skip = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    _, y = init_and_apply(UnetrBasicBlock(8), x)
    assert y.shape == (1, 8, 8, 8)
    mod = UnetrUpBlock(8)
    variables = mod.init(KEY, x, skip)
    y = mod.apply(variables, x, skip)
    assert y.shape == (1, 16, 16, 8)


@pytest.fixture(scope="module")
def tiny_uper():
    model = MLLAUper(
        out_channels=3, embed_dim=16, patch_size=2, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), mlp_ratio=2, sr_ratio=(8, 4, 2, 2),
        drop_path_rate=0.1, deep_supervision=True,
    )
    x = jnp.zeros((1, 32, 32, 2), jnp.float32)
    variables = model.init({"params": KEY, "dropout": KEY}, x)
    return model, variables


def test_mlla_uper_deep_supervision(tiny_uper, rng):
    model, variables = tiny_uper
    x = jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32))
    outs = model.apply(variables, x)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 3)
    assert outs[1].shape == (1, 16, 16, 3)
    assert outs[2].shape == (1, 8, 8, 3)
    assert outs[3].shape == (1, 4, 4, 3)
    assert outs[4].shape == (1, 2, 2, 3)


def test_mlla_uper_no_ds(rng):
    model = MLLAUper(
        out_channels=2, embed_dim=16, patch_size=2, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), mlp_ratio=2, sr_ratio=(8, 4, 2, 2),
        deep_supervision=False,
    )
    x = jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32))
    variables = model.init({"params": KEY, "dropout": KEY}, x)
    out = model.apply(variables, x)
    assert out.shape == (1, 32, 32, 2)


def test_mlla_uper_gradient_flow(tiny_uper, rng):
    """Every parameter should receive a nonzero-ish gradient."""
    model, variables = tiny_uper
    x = jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32))

    def loss(params):
        outs = model.apply({"params": params}, x)
        return sum(jnp.sum(o ** 2) for o in outs)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert len(flat) > 50
    n_zero = sum(
        1 for _, g in flat if float(jnp.max(jnp.abs(g))) == 0.0
    )
    # a few zeros are tolerable (dead-ish inits), wholesale zeros are a bug
    assert n_zero < len(flat) * 0.05, f"{n_zero}/{len(flat)} params got zero grad"


def test_mlla_uper_dropout_path_rng(tiny_uper, rng):
    """Training mode (deterministic=False) must differ across dropout keys."""
    model, variables = tiny_uper
    x = jnp.asarray(rng.randn(2, 32, 32, 2).astype(np.float32))
    o1 = model.apply(variables, x, False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(variables, x, False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1[0]), np.asarray(o2[0]))


def test_gradients_bounded_on_zero_padded_input(rng):
    """Regression: exact-zero padded regions (patch larger than the case)
    must not blow up gradients through the channel LayerNorms. Flax's
    zero bias init produced exactly-zero LN inputs there, amplifying the
    backward by 1/sqrt(eps) per layer (observed 1e24)."""
    import optax

    from mlagg_unet_tpu.models.mlla_uper import MLLAUper
    from mlagg_unet_tpu.training import losses as L

    model = MLLAUper(out_channels=3, embed_dim=16, patch_size=2,
                     depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4),
                     mlp_ratio=2, sr_ratio=(8, 4, 2, 2),
                     drop_path_rate=0.1, deep_supervision=True)
    # tiny "case" in the middle of a mostly-zero patch
    data = np.zeros((2, 32, 32, 1), np.float32)
    data[:, 12:20, 12:20, 0] = rng.randn(2, 8, 8)
    target = np.zeros((2, 32, 32), np.int32)
    target[:, 14:18, 14:18] = 1
    x = jnp.asarray(data)
    t = jnp.asarray(target)
    params = model.init({"params": KEY, "dropout": KEY}, x[:1])["params"]

    scales = [[1, 1], [.5, .5], [.25, .25], [.125, .125], [.0625, .0625]]
    w = L.deep_supervision_weights(5)

    def loss(p):
        outs = model.apply({"params": p}, x, False, rngs={"dropout": KEY})
        tgts = L.downsample_seg_for_ds(t, scales)
        return L.deep_supervision_loss(
            lambda o, tt: L.dc_and_ce_loss(o, tt, batch_dice=True,
                                           do_bg=False), outs, tgts, w)

    g = jax.grad(loss)(params)
    gn = float(optax.global_norm(g))
    assert np.isfinite(gn), "gradient norm overflowed"
    assert gn < 1e4, f"gradient norm suspiciously large: {gn}"
