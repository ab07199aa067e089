"""Wider model zoo: MedNeXt full nets, U-Mamba, SS2D cell, dynamic UNet 3D
with anisotropic strides."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def _init_apply(module, *args):
    variables = module.init({"params": KEY, "dropout": KEY}, *args)
    return module.apply(variables, *args)


def test_mednext_net_2d(rng):
    from mlagg_unet_tpu.models.mednext_net import create_mednext_v1

    model = create_mednext_v1(1, 3, "S", 3, deep_supervision=True,
                              spatial_dims=2)
    x = jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32))
    outs = _init_apply(model, x)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 3)
    assert outs[-1].shape == (1, 2, 2, 3)


def test_mednext_net_3d(rng):
    from mlagg_unet_tpu.models.mednext_net import create_mednext_v1

    model = create_mednext_v1(2, 2, "S", 3, deep_supervision=False,
                              spatial_dims=3)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 2).astype(np.float32))
    out = _init_apply(model, x)
    assert out.shape == (1, 16, 16, 16, 2)


def test_mednext_mambaskip(rng):
    from mlagg_unet_tpu.models.mednext_net import MedNeXtNet

    model = MedNeXtNet(n_classes=2, n_channels=8, exp_r=2, kernel_size=3,
                       deep_supervision=False, spatial_dims=2,
                       use_mamba_skip=True, mamba_hidden_dim=4)
    x = jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32))
    out = _init_apply(model, x)
    assert out.shape == (1, 32, 32, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_mamba_block(rng):
    from mlagg_unet_tpu.models.mamba_block import MambaBlock

    m = MambaBlock(d_model=16, d_state=4)
    x = jnp.asarray(rng.randn(2, 24, 16).astype(np.float32))
    out = _init_apply(m, x)
    assert out.shape == (2, 24, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_mamba_block_causality(rng):
    """Changing a late token must not affect earlier outputs."""
    from mlagg_unet_tpu.models.mamba_block import MambaBlock

    m = MambaBlock(d_model=8, d_state=4)
    x = jnp.asarray(rng.randn(1, 16, 8).astype(np.float32))
    variables = m.init({"params": KEY}, x)
    y1 = m.apply(variables, x)
    x2 = x.at[0, 12].set(100.0)
    y2 = m.apply(variables, x2)
    np.testing.assert_allclose(np.asarray(y1[0, :12]), np.asarray(y2[0, :12]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(y1[0, 12:]), np.asarray(y2[0, 12:]))


def test_ss2d_cell(rng):
    from mlagg_unet_tpu.models.mamba_block import SS2D

    m = SS2D(d_model=8, d_state=4)
    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    out = _init_apply(m, x)
    assert out.shape == (1, 8, 8, 8)


def test_umamba_bot_from_plans(rng):
    from mlagg_unet_tpu.models.umamba import UMambaUNet

    model = UMambaUNet(
        num_classes=3, n_stages=3, features_per_stage=[8, 16, 32],
        conv_kernel_sizes=[[3, 3]] * 3,
        pool_op_kernel_sizes=[[1, 1], [2, 2], [2, 2]],
        n_conv_per_stage_encoder=[1, 1, 1],
        n_conv_per_stage_decoder=[1, 1],
        deep_supervision=True, mamba_mode="bot",
    )
    x = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    outs = _init_apply(model, x)
    assert outs[0].shape == (1, 16, 16, 3)
    assert outs[1].shape == (1, 8, 8, 3)


def test_dynamic_unet_3d_anisotropic(rng):
    from mlagg_unet_tpu.models.dynamic_unet import PlainConvUNet

    model = PlainConvUNet(
        num_classes=2, n_stages=3, features_per_stage=[4, 8, 16],
        conv_kernel_sizes=[[1, 3, 3], [3, 3, 3], [3, 3, 3]],
        pool_op_kernel_sizes=[[1, 1, 1], [1, 2, 2], [2, 2, 2]],
        n_conv_per_stage_encoder=[1, 1, 1],
        n_conv_per_stage_decoder=[1, 1],
        deep_supervision=True,
    )
    x = jnp.asarray(rng.randn(1, 4, 16, 16, 1).astype(np.float32))
    outs = _init_apply(model, x)
    assert len(outs) == 2  # one DS head per decoder stage
    assert outs[0].shape == (1, 4, 16, 16, 2)
    # anisotropic stride [1,2,2] halves only in-plane dims
    assert outs[1].shape == (1, 4, 8, 8, 2)


def test_registry_builders_resolve():
    from mlagg_unet_tpu.training.registry import (
        NETWORK_BUILDERS,
        TRAINER_REGISTRY,
        get_trainer_config,
    )

    for name, cfg in TRAINER_REGISTRY.items():
        assert cfg.network in NETWORK_BUILDERS, (name, cfg.network)
    flag = get_trainer_config("nnUNetTrainer_MLAgg_2D_dt_MS")
    assert flag.optimizer == "adamw"
    assert flag.initial_lr == 5e-4
    assert flag.num_epochs == 500
    assert flag.adam_eps == 1e-4
