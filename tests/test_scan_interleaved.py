"""Interleaved-operand scan mode (MSMM fast path): layout helpers, the
Pallas interleaved=True contract (interpret mode off-TPU), and the full
SS2DSkip interleaved-vs-XLA-path equivalence.

Reference semantics guarded here: the MSMM multi-scale concat scan's
uninterrupted cross-scale state flow (MambaSkip.py:405-473) must survive
the per-scale IL_MEGA padding (pad lanes are exact passthrough)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.ops.cross_scan import (
    cross_merge_multiscale_tokens_2dir,
    cross_merge_multiscale_tokens_2dir_il,
    cross_scan_multiscale_2dir,
    cross_scan_multiscale_2dir_il,
    deinterleave_to_tokens,
    il_pad_mask,
    interleave_tokens,
)
from mlagg_unet_tpu.ops.selective_scan import selective_scan
from mlagg_unet_tpu.ops.selective_scan_pallas import (
    IL_MEGA,
    interleaved_scan_ok,
    selective_scan_pallas,
)


def test_interleave_roundtrip(rng):
    tok = jnp.asarray(rng.randn(2, 2500, 5).astype(np.float32))
    il = interleave_tokens(tok, IL_MEGA)            # (B, C, 3072)
    assert il.shape == (2, 5, 3072)
    back = deinterleave_to_tokens(il[:, None], IL_MEGA, 2500)[:, 0]
    np.testing.assert_array_equal(np.asarray(back), np.asarray(tok))


def test_interleave_lane_convention(rng):
    """lane m*mega + t*128 + s must hold time m*mega + s*T + t — the v2
    kernel's contract (selective_scan_pallas.py _fwd_kernel_v2)."""
    L = IL_MEGA
    T = IL_MEGA // 128
    tok = jnp.arange(L, dtype=jnp.float32).reshape(1, L, 1)
    il = np.asarray(interleave_tokens(tok, IL_MEGA))[0, 0]
    for lane in (0, 1, 127, 128, 130, 999):
        t, s = divmod(lane, 128)
        assert il[lane] == s * T + t, (lane, il[lane])


def test_il_pad_mask_matches_layout():
    shapes = [(40, 30), (20, 15), (10, 8)]
    for rev in (False, True):
        mask = il_pad_mask(shapes, IL_MEGA, rev)
        # build the same mask by interleaving a 0/1 token stream
        order = reversed(range(len(shapes))) if rev else range(len(shapes))
        pieces = []
        for i in order:
            H, W = shapes[i]
            tok = jnp.ones((1, H * W, 1), jnp.float32)
            pieces.append(np.asarray(
                interleave_tokens(tok, IL_MEGA))[0, 0])
        expect = np.concatenate(pieces) > 0.5
        np.testing.assert_array_equal(mask, expect)


def _mk_scan_inputs(rng, b, g, d, n, L):
    u = rng.randn(b, g, d, L).astype(np.float32)
    delta = rng.randn(b, g, d, L).astype(np.float32) * 0.5
    A = -np.exp(rng.randn(g, d, n).astype(np.float32) * 0.3)
    B = rng.randn(b, g, n, L).astype(np.float32)
    C = rng.randn(b, g, n, L).astype(np.float32)
    D = rng.randn(g, d).astype(np.float32)
    db = rng.randn(g, d).astype(np.float32) * 0.1
    return u, delta, A, B, C, D, db


def _il(x):
    """natural (.., L) -> interleaved, L % IL_MEGA == 0."""
    lead, L = x.shape[:-1], x.shape[-1]
    T = IL_MEGA // 128
    return (x.reshape(*lead, L // IL_MEGA, 128, T)
            .swapaxes(-1, -2).reshape(*lead, L))


def _dil(x):
    lead, L = x.shape[:-1], x.shape[-1]
    T = IL_MEGA // 128
    return (x.reshape(*lead, L // IL_MEGA, T, 128)
            .swapaxes(-1, -2).reshape(*lead, L))


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_interleaved_matches_natural(rng, reverse):
    b, g, d, n, L = 1, 2, 8, 4, 2 * IL_MEGA
    assert interleaved_scan_ok(b, g, d, n)
    u, delta, A, B, C, D, db = _mk_scan_inputs(rng, b, g, d, n, L)
    y_ref = selective_scan(u, delta, A, B, C, D, db, delta_softplus=True,
                           reverse=reverse)
    y_il = selective_scan_pallas(
        _il(jnp.asarray(u)), _il(jnp.asarray(delta)), A,
        _il(jnp.asarray(B)), _il(jnp.asarray(C)), D, db,
        delta_softplus=True, reverse=reverse, interleaved=True)
    y = _dil(y_il)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_interleaved_gradients(rng, reverse):
    b, g, d, n, L = 1, 2, 8, 4, 2 * IL_MEGA
    u, delta, A, B, C, D, db = _mk_scan_inputs(rng, b, g, d, n, L)
    cot = rng.randn(b, g, d, L).astype(np.float32)

    def f_nat(u, delta, B, C):
        y = selective_scan(u, delta, A, B, C, D, db, delta_softplus=True,
                           reverse=reverse)
        return jnp.sum(y * cot)

    def f_il(u, delta, B, C):
        y = selective_scan_pallas(
            _il(u), _il(delta), A, _il(B), _il(C), D, db,
            delta_softplus=True, reverse=reverse, interleaved=True)
        return jnp.sum(_dil(y) * cot)

    args = tuple(map(jnp.asarray, (u, delta, B, C)))
    g_nat = jax.grad(f_nat, argnums=(0, 1, 2, 3))(*args)
    g_il = jax.grad(f_il, argnums=(0, 1, 2, 3))(*args)
    for gn, gi in zip(g_nat, g_il):
        scale = np.abs(np.asarray(gn)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(gi) / scale,
                                   np.asarray(gn) / scale,
                                   rtol=2e-4, atol=2e-4)


def test_cross_scan_il_equals_natural_path(rng):
    """cross_scan_il + deinterleave == the natural cross_scan layouts, and
    the il merge inverts exactly (pure layout algebra, no kernel)."""
    shapes = [(12, 10), (6, 5)]
    feats = [jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
             for h, w in shapes]
    nat, l_split = cross_scan_multiscale_2dir(feats)
    for rev in (False, True):
        il_cat, l_pad = cross_scan_multiscale_2dir_il(
            feats, IL_MEGA, reverse_scales=rev)
        assert il_cat.shape[-1] == sum(l_pad)
        # per scale: deinterleave and compare against the natural layout
        order = (range(len(shapes) - 1, -1, -1) if rev
                 else range(len(shapes)))
        off = 0
        for pos, i in enumerate(order):
            H, W = shapes[i]
            L = H * W
            piece = il_cat[..., off:off + l_pad[i]]
            off += l_pad[i]
            toks = deinterleave_to_tokens(piece, IL_MEGA, L)  # (B,2,L,C)
            nat_off = sum(l_split[:i])
            nat_piece = nat[..., nat_off:nat_off + L]         # (B,2,C,L)
            np.testing.assert_array_equal(
                np.asarray(toks), np.asarray(jnp.swapaxes(nat_piece, -1, -2)))

    # merge: random per-direction outputs, natural vs il paths agree
    y_nat_f = rng.randn(2, 2, 3, nat.shape[-1]).astype(np.float32)
    y_nat_r = rng.randn(2, 2, 3, nat.shape[-1]).astype(np.float32)
    ref = cross_merge_multiscale_tokens_2dir(
        jnp.asarray(y_nat_f), jnp.asarray(y_nat_r), shapes, l_split)

    def to_il(y_nat, rev):
        # natural concat -> per-scale IL concat (zero pad tails). In the
        # reversed concat, scale i sits at offset sum(l_split[i+1:]).
        order = (range(len(shapes) - 1, -1, -1) if rev
                 else range(len(shapes)))
        pieces = []
        for i in order:
            H, W = shapes[i]
            L = H * W
            o = (sum(l_split[i + 1:]) if rev else sum(l_split[:i]))
            tokens = jnp.swapaxes(jnp.asarray(y_nat[..., o:o + L]), -1, -2)
            B, K, LL, C = tokens.shape
            pieces.append(jnp.stack([
                interleave_tokens(tokens[:, k], IL_MEGA)
                for k in range(K)], axis=1))
        return jnp.concatenate(pieces, axis=-1)

    got = cross_merge_multiscale_tokens_2dir_il(
        to_il(y_nat_f, False), to_il(y_nat_r, True), shapes, IL_MEGA)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_ss2dskip_interleaved_gradients_match_xla(rng):
    """Training path: parameter gradients through the full MSMM block must
    agree between the interleaved Pallas path (interpret mode) and the XLA
    fallback — covers the cross-scan transposes' adjoints, the pad-mask
    where, and the interleaved custom_vjp in one shot."""
    from mlagg_unet_tpu import ops as ops_mod
    from mlagg_unet_tpu.models.mamba_skip import SS2DSkip

    shapes = [(12, 10), (6, 5)]
    feats = [jnp.asarray(rng.randn(1, h, w, 4).astype(np.float32))
             for h, w in shapes]
    cell = SS2DSkip(d_model=4, d_state=4)
    params = cell.init(jax.random.PRNGKey(0), feats)

    def loss(p):
        outs = cell.apply(p, feats)
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(outs))

    g_xla = jax.grad(loss)(params)
    prev = ops_mod._SCAN_IMPL
    ops_mod.set_default_scan_impl("pallas")
    try:
        g_il = jax.grad(loss)(params)
    finally:
        ops_mod.set_default_scan_impl(prev)

    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    flat_i, _ = jax.tree_util.tree_flatten(g_il)
    for gx, gi in zip(flat_x, flat_i):
        scale = np.abs(np.asarray(gx)).max() + 1e-6
        rel = np.abs(np.asarray(gi) - np.asarray(gx)).max() / scale
        assert rel < 5e-4, rel


def test_ss2d_interleaved_matches_xla_path(rng):
    """Single-scale VMamba SS2D cell (4-direction): forced-Pallas
    interleaved path (interpret mode off TPU) vs the XLA fallback."""
    from mlagg_unet_tpu import ops as ops_mod
    from mlagg_unet_tpu.models.mamba_block import SS2D

    x = jnp.asarray(rng.randn(1, 24, 20, 4).astype(np.float32))
    cell = SS2D(d_model=4, d_state=4)
    params = cell.init(jax.random.PRNGKey(0), x)

    y_xla = cell.apply(params, x)
    prev = ops_mod._SCAN_IMPL
    ops_mod.set_default_scan_impl("pallas")
    try:
        y_il = cell.apply(params, x)
    finally:
        ops_mod.set_default_scan_impl(prev)
    scale = np.abs(np.asarray(y_xla)).max() + 1e-6
    rel = np.abs(np.asarray(y_il) - np.asarray(y_xla)).max() / scale
    assert rel < 2e-4, rel


def test_ss2dskip_interleaved_matches_xla_path(rng):
    """Full MSMM block: forced-Pallas interleaved path (interpret mode off
    TPU) vs the XLA fallback path — same params, same inputs, same output.
    Multi-scale with non-IL_MEGA-aligned scales exercises the interior pad
    passthrough."""
    from mlagg_unet_tpu import ops as ops_mod
    from mlagg_unet_tpu.models.mamba_skip import SS2DSkip

    shapes = [(24, 20), (12, 10)]
    feats = [jnp.asarray(rng.randn(1, h, w, 4).astype(np.float32))
             for h, w in shapes]
    cell = SS2DSkip(d_model=4, d_state=4)
    params = cell.init(jax.random.PRNGKey(0), feats)

    y_xla = cell.apply(params, feats)
    prev = ops_mod._SCAN_IMPL
    ops_mod.set_default_scan_impl("pallas")
    try:
        y_il = cell.apply(params, feats)
    finally:
        ops_mod.set_default_scan_impl(prev)
    for a, b in zip(y_il, y_xla):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
        assert rel < 2e-4, rel
