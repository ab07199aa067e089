"""Sliding-window inference: step computation parity, gaussian, batched
scatter-add correctness (constant-prediction invariance), mirror TTA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.inference import sliding_window as sw


def test_steps_match_reference_formula():
    steps = sw.compute_steps_for_sliding_window((64, 64), (32, 32), 0.5)
    assert steps == [[0, 16, 32], [0, 16, 32]]
    steps = sw.compute_steps_for_sliding_window((32, 32), (32, 32), 0.5)
    assert steps == [[0], [0]]
    steps = sw.compute_steps_for_sliding_window((65, 33), (32, 32), 0.5)
    # last tile must end exactly at the image edge
    assert steps[0][-1] == 65 - 32
    assert steps[1][-1] == 33 - 32


def test_gaussian_properties():
    g = sw.compute_gaussian((16, 16))
    assert g.shape == (16, 16)
    assert g.max() == 1.0
    assert g.min() > 0
    assert g[8, 8] == g.max()


def test_pad_to_min_size():
    x = np.ones((1, 10, 20))
    p, bounds = sw.pad_to_min_size(x, (16, 16))
    assert p.shape == (1, 16, 20)
    assert bounds == [[3, 13], [0, 20]]


def _constant_net(value, num_classes):
    def apply_fn(variables, x):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        return jnp.full((B, *spatial, num_classes), value, jnp.float32)

    return apply_fn


def test_constant_prediction_invariance(rng):
    """Gaussian-weighted overlap-add of a constant prediction must return
    exactly that constant everywhere."""
    data = rng.rand(2, 40, 52).astype(np.float32)
    apply_fn = _constant_net(3.25, 4)
    logits = sw.predict_sliding_window_return_logits(
        apply_fn, {}, data, (32, 32), 4, mirror_axes=(0, 1),
        tile_step_size=0.5, tile_batch_size=3,
    )
    assert logits.shape == (4, 40, 52)
    np.testing.assert_allclose(logits, 3.25, rtol=1e-5)


def test_identity_net_reconstruction(rng):
    """A net that echoes its input channel must reconstruct the image
    exactly after gaussian blending (weights cancel)."""
    def apply_fn(variables, x):
        return jnp.concatenate([x, -x], axis=-1)

    data = rng.rand(1, 48, 36).astype(np.float32)
    logits = sw.predict_sliding_window_return_logits(
        apply_fn, {}, data, (32, 32), 2, mirror_axes=(),
        tile_step_size=0.5, tile_batch_size=4,
    )
    np.testing.assert_allclose(logits[0], data[0], atol=1e-4)
    np.testing.assert_allclose(logits[1], -data[0], atol=1e-4)


def test_mirror_tta_unflips_outputs(rng):
    """TTA flips the input AND unflips the output (reference :82-107): an
    input-echoing net is equivariant, so the TTA average equals the input
    exactly. A net that ignores orientation (flips its input internally)
    would instead see averaging — checked via an asymmetric net below."""
    def apply_fn(variables, x):
        return x[..., :1]

    data = rng.rand(1, 32, 32).astype(np.float32)
    logits = sw.predict_sliding_window_return_logits(
        apply_fn, {}, data, (32, 32), 1, mirror_axes=(0, 1),
    )
    np.testing.assert_allclose(logits[0], data[0], atol=1e-5)

    # orientation-SENSITIVE net: output depends on absolute position, so the
    # 4 unflipped variants differ and TTA averages them
    def apply_fn2(variables, x):
        ramp = jnp.arange(x.shape[1], dtype=jnp.float32)[None, :, None, None]
        return x[..., :1] * ramp

    logits2 = sw.predict_sliding_window_return_logits(
        apply_fn2, {}, data, (32, 32), 1, mirror_axes=(0,),
    )
    d = data[0]
    ramp = np.arange(32, dtype=np.float32)[:, None]
    expected = (d * ramp + (d[::-1] * ramp)[::-1]) / 2
    np.testing.assert_allclose(logits2[0], expected, atol=1e-4)


def test_2d_network_over_3d_volume(rng):
    apply_fn = _constant_net(1.0, 3)
    data = rng.rand(2, 5, 40, 40).astype(np.float32)  # (c, z, y, x)
    logits = sw.predict_sliding_window_return_logits(
        apply_fn, {}, data, (32, 32), 3,
    )
    assert logits.shape == (3, 5, 40, 40)
    np.testing.assert_allclose(logits, 1.0, rtol=1e-5)


def test_autotune_candidate_sets():
    """Candidate construction for the tile-batch autotuner: small model
    batches always probed, the budget's choice only when cheap to
    evaluate (model batch <= 64), everything capped by the budget."""
    from mlagg_unet_tpu.inference.sliding_window import VolumePredictor

    c = VolumePredictor.autotune_candidates
    # flagship bench shape: 4 mirror combos, budget picked tb=40
    assert c(40, 4) == [2, 4, 8]            # model 160 too big to time
    assert c(10, 4) == [2, 4, 8, 10]        # budget's choice competes
    assert c(8, 4) == [2, 4, 8]
    assert c(2, 4) == [2]                   # capped by budget
    assert c(3, 8) == [1, 2, 3]             # 3D: 8 combos
    assert c(1, 4) == [1]
    # no-TTA predictor: combos == 1
    assert c(64, 1) == [8, 16, 32, 64]
    assert c(100, 1) == [8, 16, 32]


def test_upload_dtype_auto_is_equivalent(rng):
    """upload_dtype='auto' (host-side compute_dtype cast) must match the
    fp32-upload path bit-for-bit when compute_dtype is set: the tiles are
    cast to compute_dtype before the network either way."""
    import jax.numpy as jnp

    def apply_fn(variables, x):
        return jnp.concatenate([x.astype(jnp.float32),
                                -x.astype(jnp.float32)], axis=-1)

    data = rng.rand(1, 48, 36).astype(np.float32)
    outs = []
    for upload in ("auto", jnp.float32):
        pred = sw.VolumePredictor(apply_fn, {}, (32, 32), 2, (),
                                  tile_batch_size=2,
                                  compute_dtype=jnp.bfloat16,
                                  upload_dtype=upload)
        outs.append(pred(data))
    np.testing.assert_array_equal(outs[0], outs[1])
