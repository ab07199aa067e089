"""Batched sliding-window inference with Gaussian blending + mirror TTA.

Reference: inference/sliding_window_prediction.py:13-208. Semantics parity:
half-overlap tile grid (steps :30-54), Gaussian importance map with
sigma = tile/8 (:13-27), mirror TTA averaging over all flip combinations of
the allowed axes (:82-107), weighted accumulate logits += pred * gauss;
n += gauss; logits /= n (:186-195).

TPU-first design (SURVEY.md section 7): instead of a Python loop issuing one
network call per tile per mirror variant, tiles are gathered into fixed-size
BATCHES (static shapes; the tail batch is padded and masked), each batch runs
every mirror variant stacked along the batch dim in ONE network call, and the
Gaussian-weighted scatter-add runs as a jitted fori_loop of
dynamic_update_slice on a device-resident fp32 accumulator. Per-case work is
two jitted functions, both cached across cases by (padded shape, tile count
bucket).
"""
from __future__ import annotations

import functools
import itertools
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_gaussian(tile_size: Sequence[int], sigma_scale: float = 1.0 / 8,
                     value_scaling_factor: float = 1.0) -> np.ndarray:
    """reference :13-27 (scipy-free separable gaussian)."""
    center = [i // 2 for i in tile_size]
    sigmas = [i * sigma_scale for i in tile_size]
    g = np.ones(tile_size, np.float64)
    for ax, (s, c, sig) in enumerate(zip(tile_size, center, sigmas)):
        x = np.arange(s, dtype=np.float64)
        k = np.exp(-((x - c) ** 2) / (2 * sig ** 2))
        shape = [1] * len(tile_size)
        shape[ax] = s
        g = g * k.reshape(shape)
    g = g / g.max() * value_scaling_factor
    g = g.astype(np.float32)
    # no zeros (division safety), reference :26
    g[g == 0] = np.min(g[g != 0])
    return g


def compute_steps_for_sliding_window(image_size: Sequence[int],
                                     tile_size: Sequence[int],
                                     tile_step_size: float) -> List[List[int]]:
    """reference :30-54."""
    assert all(i >= j for i, j in zip(image_size, tile_size))
    assert 0 < tile_step_size <= 1

    target_step_sizes = [i * tile_step_size for i in tile_size]
    num_steps = [
        int(np.ceil((i - k) / j)) + 1
        for i, j, k in zip(image_size, target_step_sizes, tile_size)
    ]
    steps = []
    for dim in range(len(tile_size)):
        max_step_value = image_size[dim] - tile_size[dim]
        if num_steps[dim] > 1:
            actual_step_size = max_step_value / (num_steps[dim] - 1)
        else:
            actual_step_size = 99999999999
        steps.append([
            int(np.round(actual_step_size * i)) for i in range(num_steps[dim])
        ])
    return steps


def get_tile_positions(image_size: Sequence[int], tile_size: Sequence[int],
                       tile_step_size: float = 0.5) -> np.ndarray:
    """All tile corner positions, (n_tiles, dim) int32."""
    steps = compute_steps_for_sliding_window(image_size, tile_size,
                                             tile_step_size)
    return np.array(list(itertools.product(*steps)), dtype=np.int32)


def pad_to_min_size(data: np.ndarray, min_size: Sequence[int]
                    ) -> Tuple[np.ndarray, List[List[int]]]:
    """Pad (..., *spatial) spatial dims up to min_size (centered, like
    acvl pad_nd_image). Returns padded array + slicer bounds to undo."""
    spatial = data.shape[-len(min_size):]
    pads = []
    for s, m in zip(spatial, min_size):
        total = max(0, m - s)
        pads.append((total // 2, total - total // 2))
    full_pad = [(0, 0)] * (data.ndim - len(min_size)) + pads
    padded = np.pad(data, full_pad) if any(p != (0, 0) for p in pads) else data
    bounds = [[p[0], p[0] + s] for p, s in zip(pads, spatial)]
    return padded, bounds


def _mirror_variants(mirror_axes: Tuple[int, ...]):
    """All flip-combos incl. the identity (reference :93-101)."""
    combos = [()]
    for r in range(1, len(mirror_axes) + 1):
        combos += list(itertools.combinations(mirror_axes, r))
    return combos


def _as_variables(params) -> dict:
    """Accept either a bare params pytree or a full flax variables dict
    (with 'params' plus e.g. 'batch_stats' for BatchNorm nets)."""
    if isinstance(params, dict) and "params" in params:
        return params
    return {"params": params}


def make_tile_predictor(
    apply_fn: Callable,
    params,
    tile_size: Sequence[int],
    num_classes: int,
    mirror_axes: Tuple[int, ...] = (),
    tile_batch_size: int = 8,
    compute_dtype=None,
):
    """Returns a jitted fn: (tiles (T, *tile, C)) -> logits (T, *tile, K),
    averaging over all mirror variants in a single network call.

    compute_dtype=bfloat16 casts params + activations for the forward (the
    TPU analogue of the reference's AMP inference); logits return fp32.
    """
    combos = _mirror_variants(tuple(mirror_axes))
    dim = len(tile_size)
    if compute_dtype is not None and compute_dtype != jnp.float32:
        cast_params = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), params
        )
    else:
        cast_params = params

    def predict(tiles):
        # stack mirror variants on batch: (V*T, *tile, C)
        variants = []
        for combo in combos:
            v = tiles
            for ax in combo:
                v = jnp.flip(v, axis=1 + ax)
            variants.append(v)
        stacked = jnp.concatenate(variants, axis=0)
        if compute_dtype is not None:
            stacked = stacked.astype(compute_dtype)
        out = apply_fn(_as_variables(cast_params), stacked)
        if isinstance(out, (list, tuple)):
            out = out[0]
        out = out.astype(jnp.float32)
        T = tiles.shape[0]
        acc = jnp.zeros((T, *tile_size, num_classes), jnp.float32)
        for i, combo in enumerate(combos):
            o = out[i * T: (i + 1) * T]
            for ax in combo:
                o = jnp.flip(o, axis=1 + ax)
            acc = acc + o
        return acc / len(combos)

    return jax.jit(predict)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_add_tiles(logits_acc, n_acc, tile_logits, gaussian, positions,
                       valid):
    """logits_acc: (*img, K); n_acc: (*img,); tile_logits: (T, *tile, K);
    gaussian: (*tile,); positions: (T, dim); valid: (T,) mask for padding."""
    dim = positions.shape[1]
    tile_shape = tile_logits.shape[1:-1]
    K = tile_logits.shape[-1]

    def body(i, carry):
        acc, n = carry
        pos = tuple(positions[i, d] for d in range(dim))
        w = gaussian * valid[i]
        contrib = tile_logits[i] * w[..., None]
        cur = jax.lax.dynamic_slice(acc, (*pos, 0), (*tile_shape, K))
        acc = jax.lax.dynamic_update_slice(acc, cur + contrib, (*pos, 0))
        cur_n = jax.lax.dynamic_slice(n, pos, tile_shape)
        n = jax.lax.dynamic_update_slice(n, cur_n + w, pos)
        return acc, n

    return jax.lax.fori_loop(0, tile_logits.shape[0], body,
                             (logits_acc, n_acc))


@functools.partial(jax.jit, static_argnames=("tile_shape",))
def _gather_tiles(data, positions, tile_shape):
    """data: (*img, C); positions: (T, dim) -> (T, *tile, C)."""
    dim = positions.shape[1]

    def one(pos):
        idx = tuple(pos[d] for d in range(dim))
        return jax.lax.dynamic_slice(
            data, (*idx, 0), (*tile_shape, data.shape[-1])
        )

    return jax.vmap(one)(positions)


def predict_sliding_window_return_logits(
    apply_fn: Callable,
    params,
    data: np.ndarray,
    tile_size: Sequence[int],
    num_classes: int,
    mirror_axes: Tuple[int, ...] = (),
    tile_step_size: float = 0.5,
    tile_batch_size: int = 8,
    use_gaussian: bool = True,
    verbose: bool = False,
    precomputed_predictor=None,
) -> np.ndarray:
    """data: (c, *spatial) host array (reference layout). Returns fp32
    logits (num_classes, *spatial).

    For 2D networks on 3D volumes, pass tile_size of length 2: each z-slice
    is tiled in-plane (the reference's 2D-tiles-over-3D mode, :57-79) with
    slices batched together.
    """
    dim = len(tile_size)
    spatial = data.shape[1:]

    if dim == len(spatial) - 1:
        return _predict_2d_over_3d(
            apply_fn, params, data, tile_size, num_classes, mirror_axes,
            tile_step_size, tile_batch_size, use_gaussian,
            precomputed_predictor,
        )

    assert dim == len(spatial)

    # pad to >= tile
    padded, bounds = pad_to_min_size(data, tile_size)
    img_shape = padded.shape[1:]
    positions = get_tile_positions(img_shape, tile_size, tile_step_size)
    n_tiles = len(positions)

    gaussian = (compute_gaussian(tile_size) if use_gaussian
                else np.ones(tile_size, np.float32))

    # channels-last on device
    dev_data = jnp.asarray(np.moveaxis(padded, 0, -1))
    logits_acc = jnp.zeros((*img_shape, num_classes), jnp.float32)
    n_acc = jnp.zeros(img_shape, jnp.float32)
    g = jnp.asarray(gaussian)

    predictor = precomputed_predictor or make_tile_predictor(
        apply_fn, params, tile_size, num_classes, mirror_axes, tile_batch_size
    )

    tb = tile_batch_size
    n_batches = int(np.ceil(n_tiles / tb))
    for b in range(n_batches):
        batch_pos = positions[b * tb: (b + 1) * tb]
        valid = np.ones(len(batch_pos), np.float32)
        if len(batch_pos) < tb:  # pad tail batch to static size
            pad_n = tb - len(batch_pos)
            batch_pos = np.concatenate(
                [batch_pos, np.zeros((pad_n, dim), np.int32)]
            )
            valid = np.concatenate([valid, np.zeros(pad_n, np.float32)])
        pos_j = jnp.asarray(batch_pos)
        tiles = _gather_tiles(dev_data, pos_j, tuple(tile_size))
        tile_logits = predictor(tiles)
        logits_acc, n_acc = _scatter_add_tiles(
            logits_acc, n_acc, tile_logits, g, pos_j, jnp.asarray(valid)
        )

    logits = logits_acc / n_acc[..., None]
    # back to channel-first, unpad
    logits_np = np.moveaxis(np.asarray(logits), -1, 0)
    slicer = tuple([slice(None)] + [slice(lo, hi) for lo, hi in bounds])
    return logits_np[slicer]


@functools.partial(jax.jit, static_argnames=("tile_shape",))
def _gather_tiles_z(volume, positions, tile_shape):
    """volume: (Z, H, W, C); positions: (T, 3) of (z, y, x) ->
    (T, *tile_shape, C) in-plane tiles."""

    def one(pos):
        t = jax.lax.dynamic_slice(
            volume, (pos[0], pos[1], pos[2], 0),
            (1, *tile_shape, volume.shape[-1]),
        )
        return t[0]

    return jax.vmap(one)(positions)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_add_tiles_z(logits_acc, n_acc, tile_logits, gaussian, positions,
                         valid):
    """logits_acc: (Z, H, W, K); n_acc: (Z, H, W); tile_logits:
    (T, ty, tx, K); positions: (T, 3)."""
    ty, tx = tile_logits.shape[1:3]
    K = tile_logits.shape[-1]

    def body(i, carry):
        acc, n = carry
        z, y, x = positions[i, 0], positions[i, 1], positions[i, 2]
        w = gaussian * valid[i]
        contrib = (tile_logits[i] * w[..., None])[None]
        cur = jax.lax.dynamic_slice(acc, (z, y, x, 0), (1, ty, tx, K))
        acc = jax.lax.dynamic_update_slice(acc, cur + contrib, (z, y, x, 0))
        cur_n = jax.lax.dynamic_slice(n, (z, y, x), (1, ty, tx))
        n = jax.lax.dynamic_update_slice(n, cur_n + w[None], (z, y, x))
        return acc, n

    return jax.lax.fori_loop(0, tile_logits.shape[0], body,
                             (logits_acc, n_acc))


class VolumePredictor:
    """Whole-volume sliding-window prediction as ONE jitted call: a
    lax.fori_loop over fixed-size tile batches where each iteration gathers
    tiles, runs all mirror variants through the network in a single forward,
    and Gaussian-scatter-adds into the device-resident accumulator. Zero
    host round-trips inside a volume (one upload, one logits download).

    Jitted functions are cached per (volume shape, tile count) — nnU-Net
    cases within a dataset cluster into few shapes after padding.
    """

    def __init__(self, apply_fn, params, tile_size, num_classes,
                 mirror_axes=(), tile_batch_size=None, use_gaussian=True,
                 compute_dtype=None, mesh=None, budget_fraction=None,
                 transfer_dtype=None, upload_dtype="auto"):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — tile batches
        are then sharded across devices (each device scatter-adds its tiles
        into a local accumulator; one psum merges them). The embarrassingly
        parallel TPU analogue of the reference's per-tile GPU loop.

        tile_batch_size=None (default) selects the batch from the device
        HBM budget and XLA's compile-time memory analysis of the network
        forward (inference/memory_budget.py). When the whole-volume fp32
        accumulator itself cannot fit on device, prediction falls back to
        a host-resident accumulator with tiles still running on device —
        the TPU analogue of the reference's CPU-accumulator retry
        (sliding_window_prediction.py:169-184,
        predict_from_raw_data.py:290-296).

        transfer_dtype: dtype of the device->host logits copy. None keeps
        fp32 (bit-exact with the accumulator). jnp.bfloat16 halves the
        fetch bytes — the reference itself moves HALF-precision logits to
        the CPU (predicted_logits stays torch.half through .cpu(),
        sliding_window_prediction.py:110-197). Quantization caveat: the
        reference's half is fp16 (10 mantissa bits) while bf16 keeps only
        8, so bf16-transferred logits are slightly coarser than the
        reference's — argmax equivalence of the resulting segmentation is
        near-certain but not guaranteed bit-for-bit; our on-device
        accumulation stays fp32 either way (better than the reference's
        half accumulator). finalize() returns fp32 either way.

        upload_dtype: dtype of the host->device volume transfer. "auto"
        (default) follows compute_dtype, which is EXACTLY equivalent to
        uploading fp32: tiles are cast to compute_dtype before the model
        anyway and gathers/flips are value-preserving, so casting on the
        host only moves the cast across the wire — and halves the upload
        (measured 113 ms/volume fp32 through the axon tunnel). Pass
        jnp.float32 to force a full-precision upload."""
        from . import memory_budget as _mb
        self.apply_fn = apply_fn
        self.params = params
        self.tile_size = tuple(tile_size)
        self.num_classes = num_classes
        self.mirror_axes = tuple(mirror_axes)
        self.tb = tile_batch_size
        self.use_gaussian = use_gaussian
        self.compute_dtype = compute_dtype
        self.transfer_dtype = transfer_dtype
        self.upload_dtype = (compute_dtype if upload_dtype == "auto"
                             else upload_dtype)
        self.mesh = mesh
        self.n_shards = (mesh.shape["data"]
                         if mesh is not None and "data" in mesh.shape else 1)
        self.combos = _mirror_variants(self.mirror_axes)
        if compute_dtype is not None and compute_dtype != jnp.float32:
            self.cast_params = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype), params)
        else:
            self.cast_params = params
        self._mb = _mb
        self._budget = _mb.inference_budget_bytes(
            fraction=budget_fraction or _mb.DEFAULT_BUDGET_FRACTION)
        self._params_bytes = _mb.params_bytes(self.cast_params)
        self._tile_bytes_cache = {}
        self._tile_fn_cache = {}
        self._tb_tuned = {}
        self._cache = {}

    def _probe_tile_bytes(self, in_channels: int) -> int:
        """Per-tile device temp bytes of the TTA forward (cached)."""
        key = in_channels
        if key not in self._tile_bytes_cache:
            self._tile_bytes_cache[key] = self._mb.probe_network_tile_bytes(
                self._predict_tiles, self.tile_size, in_channels)
        return self._tile_bytes_cache[key]

    def _select_tb(self, n_tiles: int, in_channels: int,
                   fixed_bytes: int) -> int:
        """Per-device tile batch from the HBM budget; user override wins."""
        if self.tb is not None:
            return self.tb
        per_tile = self._probe_tile_bytes(in_channels)
        return self._mb.select_tile_batch(
            self._budget, fixed_bytes + self._params_bytes, per_tile,
            max(1, n_tiles // self.n_shards))

    @staticmethod
    def autotune_candidates(tb_max: int, n_combos: int) -> List[int]:
        """Tile-batch candidates to time: model batches ~8/16/32 (where
        scan-/attention-heavy nets peak) plus the budget's own choice
        when its model batch is small enough that evaluating it costs
        less than it could win (conv nets do like big batches)."""
        nc = max(1, n_combos)
        cands = sorted({max(1, m // nc) for m in (8, 16, 32)})
        cands = [t for t in cands if t <= tb_max]
        if tb_max * nc <= 64 and tb_max not in cands:
            cands.append(tb_max)
        return cands

    def _autotune_tb(self, tb_max: int, in_channels: int) -> int:
        """Throughput-tuned tile batch: the HBM budget gives the LARGEST
        batch that fits, but throughput peaks far below it for
        scan-/attention-heavy nets (flagship on v5e, 2026-08-21: model
        batch 8 = 3.49 ms/tile vs batch 20 = 4.29 vs batch 160 = 4.71 —
        the budget alone picked 160 and cost 25%). TPU analogue of cuDNN
        benchmark mode (SURVEY N7): time the jitted TTA tile forward at a
        few candidate batches once per (predictor, channels) and keep the
        fastest. Compile cost is a few warmup graphs on the first volume;
        MLAGG_AUTOTUNE_TB=0 restores budget-only selection."""
        import time as _time

        if (os.environ.get("MLAGG_AUTOTUNE_TB", "1") == "0" or tb_max <= 1
                or jax.default_backend() != "tpu"):
            # off-TPU timing is meaningless (and CPU tests would pay the
            # candidate compiles); budget-only selection there
            return tb_max
        if in_channels in self._tb_tuned:
            return min(self._tb_tuned[in_channels], tb_max)
        cands = self.autotune_candidates(tb_max, len(self.combos))
        if len(cands) <= 1:
            self._tb_tuned[in_channels] = tb_max
            return tb_max
        dtype = self.upload_dtype or jnp.float32
        best_t, best_ms = None, None
        for t in cands:
            fn = self._tile_fn(t, in_channels)
            x = jnp.zeros((t, *self.tile_size, in_channels), dtype)
            jax.block_until_ready(fn(x))
            iters = max(3, 24 // t)
            t0 = _time.perf_counter()
            outs = [fn(x) for _ in range(iters)]
            jax.block_until_ready(outs[-1])
            per_tile = (_time.perf_counter() - t0) / iters / t
            if best_ms is None or per_tile < best_ms:
                best_t, best_ms = t, per_tile
        self._tb_tuned[in_channels] = best_t
        return best_t

    def _predict_tiles(self, tiles):
        """(T, *tile, C) -> fp32 (T, *tile, K), TTA-averaged."""
        variants = []
        for combo in self.combos:
            v = tiles
            for ax in combo:
                v = jnp.flip(v, axis=1 + ax)
            variants.append(v)
        stacked = jnp.concatenate(variants, axis=0)
        if self.compute_dtype is not None:
            stacked = stacked.astype(self.compute_dtype)
        out = self.apply_fn(_as_variables(self.cast_params), stacked)
        if isinstance(out, (list, tuple)):
            out = out[0]
        out = out.astype(jnp.float32)
        T = tiles.shape[0]
        acc = jnp.zeros((T, *self.tile_size, self.num_classes), jnp.float32)
        for i, combo in enumerate(self.combos):
            o = out[i * T: (i + 1) * T]
            for ax in combo:
                o = jnp.flip(o, axis=1 + ax)
            acc = acc + o
        return acc / len(self.combos)

    def _build(self, vol_shape, n_batches, z_mode, tb):
        run = self._build_local(vol_shape, n_batches, z_mode, tb)
        if self.n_shards <= 1:
            return jax.jit(run)

        # multi-chip: shard tile positions over the mesh 'data' axis; each
        # device accumulates its tiles locally, one psum merges
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        def sharded(volume, positions, valid, gaussian):
            acc = run(volume, positions, valid, gaussian,
                      normalize=False, mark_varying=True)
            acc = jax.lax.psum(acc, "data")
            return acc[0] / acc[1][..., None]

        mapped = shard_map(
            sharded, mesh=self.mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=P(),
        )
        return jax.jit(mapped)

    def _build_local(self, vol_shape, n_batches, z_mode, tb):
        tile = self.tile_size
        K = self.num_classes
        d = len(tile)

        def run(volume, positions, valid, gaussian, normalize=True,
                mark_varying=False):
            acc = jnp.zeros((*vol_shape, K), jnp.float32)
            n = jnp.zeros(vol_shape, jnp.float32)
            if mark_varying:
                # under shard_map the loop carry must be varying over 'data'
                # (pvary was deprecated in favor of pcast)
                pcast = getattr(jax.lax, "pcast", None)
                if pcast is not None:
                    acc = pcast(acc, "data", to="varying")
                    n = pcast(n, "data", to="varying")
                else:
                    acc = jax.lax.pvary(acc, ("data",))
                    n = jax.lax.pvary(n, ("data",))

            def gather_one(pos):
                if z_mode:
                    t = jax.lax.dynamic_slice(
                        volume, (pos[0], pos[1], pos[2], 0),
                        (1, *tile, volume.shape[-1]))
                    return t[0]
                idx = tuple(pos[i] for i in range(d))
                return jax.lax.dynamic_slice(
                    volume, (*idx, 0), (*tile, volume.shape[-1]))

            def body(b, carry):
                acc, n = carry
                pos = jax.lax.dynamic_slice(positions, (b * tb, 0),
                                            (tb, positions.shape[1]))
                val = jax.lax.dynamic_slice(valid, (b * tb,), (tb,))
                tiles = jax.vmap(gather_one)(pos)
                tl = self._predict_tiles(tiles)

                def scatter(i, carry):
                    acc, n = carry
                    w = gaussian * val[i]
                    if z_mode:
                        z, y, x = pos[i, 0], pos[i, 1], pos[i, 2]
                        contrib = (tl[i] * w[..., None])[None]
                        cur = jax.lax.dynamic_slice(
                            acc, (z, y, x, 0), (1, *tile, K))
                        acc = jax.lax.dynamic_update_slice(
                            acc, cur + contrib, (z, y, x, 0))
                        cur_n = jax.lax.dynamic_slice(n, (z, y, x),
                                                      (1, *tile))
                        n = jax.lax.dynamic_update_slice(
                            n, cur_n + w[None], (z, y, x))
                    else:
                        idx = tuple(pos[i, j] for j in range(d))
                        contrib = tl[i] * w[..., None]
                        cur = jax.lax.dynamic_slice(acc, (*idx, 0),
                                                    (*tile, K))
                        acc = jax.lax.dynamic_update_slice(
                            acc, cur + contrib, (*idx, 0))
                        cur_n = jax.lax.dynamic_slice(n, idx, tile)
                        n = jax.lax.dynamic_update_slice(n, cur_n + w, idx)
                    return acc, n

                return jax.lax.fori_loop(0, tb, scatter, (acc, n))

            acc, n = jax.lax.fori_loop(0, n_batches, body, (acc, n))
            if not normalize:
                return acc, n
            out = acc / n[..., None]
            if self.transfer_dtype is not None:
                out = out.astype(self.transfer_dtype)
            return out

        return run

    def predict_device(self, data: np.ndarray):
        """Async variant: returns (device logits (*vol, K), bounds, z_mode)
        WITHOUT forcing a host transfer — lets callers pipeline multiple
        volumes (dispatch all, then fetch). The device->host copy is
        started asynchronously (it runs as soon as the compute finishes,
        overlapping the next volume's compute; measured 0.65-0.8 s per
        ACDC-like volume when fetched synchronously through the tunnel)."""
        result = self._run(data)
        logits = result[0]
        if hasattr(logits, "copy_to_host_async"):
            logits.copy_to_host_async()
        return result

    def __call__(self, data: np.ndarray) -> np.ndarray:
        """data: (c, *spatial) host array -> fp32 logits (K, *spatial)."""
        return self.finalize(self._run(data))

    def finalize(self, result) -> np.ndarray:
        """Fetch + unpad a predict_device result (fp32 out)."""
        logits, bounds, z_mode = result
        logits_np = np.moveaxis(np.asarray(logits).astype(np.float32), -1, 0)
        lead = [slice(None)] * (2 if z_mode else 1)  # (K[, Z]) untouched
        slicer = tuple(lead + [slice(lo, hi) for lo, hi in bounds])
        return logits_np[slicer]

    def _run(self, data: np.ndarray):
        tile = self.tile_size
        d = len(tile)
        spatial = data.shape[1:]
        z_mode = d == len(spatial) - 1
        assert z_mode or d == len(spatial)

        padded, bounds = pad_to_min_size(data, tile)
        vol_shape = padded.shape[1:]
        if z_mode:
            Z = vol_shape[0]
            inplane = get_tile_positions(vol_shape[1:], tile, 0.5)
            positions = np.concatenate([
                np.concatenate([np.full((len(inplane), 1), z, np.int32),
                                inplane], axis=1)
                for z in range(Z)
            ])
        else:
            positions = get_tile_positions(vol_shape, tile, 0.5)

        n_tiles = len(positions)
        C = data.shape[0]
        fixed = self._mb.accumulator_bytes(vol_shape, self.num_classes, C)
        if (self.tb is not None
                and fixed + self._params_bytes < 0.5 * self._budget):
            # user-pinned batch on a comfortably fitting volume: no probe
            tb = self.tb
        else:
            # probe the network's per-tile temp; host fallback when the
            # device-resident volume state plus one minimal batch overflows
            min_net = (self._probe_tile_bytes(C)
                       if fixed + self._params_bytes < self._budget else 0)
            if fixed + self._params_bytes + min_net >= self._budget:
                return self._run_host(padded, bounds, z_mode, positions, C)
            tb = self._autotune_tb(self._select_tb(n_tiles, C, fixed), C)
        granule = tb * self.n_shards
        pad_n = (-n_tiles) % granule
        valid = np.ones(n_tiles, np.float32)
        if pad_n:
            positions = np.concatenate(
                [positions, np.zeros((pad_n, positions.shape[1]), np.int32)])
            valid = np.concatenate([valid, np.zeros(pad_n, np.float32)])
        n_batches = len(positions) // granule

        key = (vol_shape, n_batches, z_mode, tb)
        if key not in self._cache:
            self._cache[key] = self._build(vol_shape, n_batches, z_mode, tb)
        run = self._cache[key]

        gaussian = (compute_gaussian(tile) if self.use_gaussian
                    else np.ones(tile, np.float32))
        vol_np = np.moveaxis(padded, 0, -1)
        if self.upload_dtype is not None:
            # host-side cast: halves the wire bytes, exactly equivalent to
            # the device-side compute_dtype cast (see __init__ docstring)
            vol_np = vol_np.astype(self.upload_dtype)
        volume = jnp.asarray(vol_np)
        logits = run(volume, jnp.asarray(positions), jnp.asarray(valid),
                     jnp.asarray(gaussian))
        return logits, bounds, z_mode

    # ---- host-accumulator fallback (large volumes) ----

    def _tile_fn(self, tb: int, in_channels: int):
        """Jitted standalone TTA forward for (tb, *tile, C) host batches."""
        key = (tb, in_channels)
        if key not in self._tile_fn_cache:
            self._tile_fn_cache[key] = jax.jit(self._predict_tiles)
        return self._tile_fn_cache[key]

    def _run_host(self, padded, bounds, z_mode, positions, in_channels):
        """Large-volume path: fp32 logits + n-map accumulate in host RAM;
        tiles are gathered on host, forwarded on device in batches, and
        fetched with a one-batch pipeline (scatter of batch b overlaps the
        device forward of batch b+1). Mirrors the reference's
        CPU-accumulator fallback (sliding_window_prediction.py:169-184)."""
        tile = self.tile_size
        K = self.num_classes
        vol_shape = padded.shape[1:]
        # budget only needs params + network temp for one batch
        tb = self.tb or self._mb.select_tile_batch(
            self._budget, self._params_bytes,
            self._probe_tile_bytes(in_channels), len(positions))
        gaussian = (compute_gaussian(tile) if self.use_gaussian
                    else np.ones(tile, np.float32))
        vol_cl = np.ascontiguousarray(np.moveaxis(padded, 0, -1))
        acc = np.zeros((*vol_shape, K), np.float32)
        nmap = np.zeros(vol_shape, np.float32)

        fn = self._tile_fn(tb, in_channels)
        n = len(positions)
        pending = None
        for b in range(0, n, tb):
            batch_pos = positions[b: b + tb]
            tiles = np.empty((len(batch_pos), *tile, in_channels), np.float32)
            for i, pos in enumerate(batch_pos):
                if z_mode:
                    z, y, x = pos
                    tiles[i] = vol_cl[z, y:y + tile[0], x:x + tile[1]]
                else:
                    sl = tuple(slice(p, p + t) for p, t in zip(pos, tile))
                    tiles[i] = vol_cl[sl]
            if len(batch_pos) < tb:  # pad tail to the compiled static shape
                tiles = np.concatenate(
                    [tiles, np.zeros((tb - len(batch_pos), *tile,
                                      in_channels), np.float32)])
            out = fn(jnp.asarray(tiles))
            if hasattr(out, "copy_to_host_async"):
                out.copy_to_host_async()
            if pending is not None:
                self._scatter_host(acc, nmap, *pending, gaussian, z_mode)
            pending = (out, batch_pos)
        if pending is not None:
            self._scatter_host(acc, nmap, *pending, gaussian, z_mode)

        acc /= nmap[..., None]
        return acc, bounds, z_mode

    @staticmethod
    def _scatter_host(acc, nmap, tile_logits, batch_pos, gaussian, z_mode):
        tl = np.asarray(tile_logits)
        tile = gaussian.shape
        for i, pos in enumerate(batch_pos):
            if z_mode:
                z, y, x = pos
                sl = (z, slice(y, y + tile[0]), slice(x, x + tile[1]))
            else:
                sl = tuple(slice(p, p + t) for p, t in zip(pos, tile))
            acc[sl] += tl[i] * gaussian[..., None]
            nmap[sl] += gaussian


def _predict_2d_over_3d(apply_fn, params, data, tile_size, num_classes,
                        mirror_axes, tile_step_size, tile_batch_size,
                        use_gaussian, precomputed_predictor):
    """2D network over a 3D volume via the fused VolumePredictor."""
    vp = VolumePredictor(apply_fn, params, tile_size, num_classes,
                         mirror_axes, tile_batch_size, use_gaussian)
    return vp(data)
