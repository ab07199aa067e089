"""Pallas TPU kernels for the selective scan (Mamba S6), forward + backward.

Why: the XLA chunked associative scan (ops/selective_scan.py) materializes
its (b, g, d, Lc, n) intermediates to HBM on every log-depth pass; at the
flagship MSMM shapes (b=20 tiles, g=4, d=96, L=19040, n=16) that measures
2.7 s per forward — 87% of the whole network. These kernels keep each
chunk's scan entirely in VMEM: HBM traffic collapses to one read of the
operands and one write of the results.

Forward: grid (BG/gb, L/Lc) with the chunk axis innermost (sequential);
each grid cell processes ``gb`` independent (batch x direction) rows at
once — gb is chosen so the ~6 live (gb, n, d, Lc) fp32 tensors of the
doubling scan fit VMEM (spilling to HBM costs ~2x). The (gb, n, d)
recurrence state persists in VMEM scratch; within a chunk the first-order
recurrence h_t = a_t h_{t-1} + b_t is solved by log-depth doubling over the
lane (time) axis via pltpu.roll + iota masking. The kernel additionally
emits each chunk's START state so the backward can recompute h locally.

Everything elementwise around the recurrence is fused in-kernel so no
full-size (b,g,d,L) intermediate ever touches HBM:
  * delta_bias + softplus on dt (matching mamba_ssm's in-kernel handling;
    MambaSkip.py:445-451 passes delta_softplus=True),
  * the D*u skip term on y,
  * in backward: the D*gy term on du, the softplus/bias chain on ddelta,
    and the (g,d)-shaped dA / dD / dbias reductions (accumulated in VMEM
    scratch across chunks).
Inputs may be bf16: operands are upcast to fp32 in VMEM, arithmetic is
fp32 (parity with the CUDA kernel's fp32 path).

Backward: the adjoint of a linear recurrence is the REVERSED recurrence
    g_t = gy_t (x) C_t + a_{t+1} (.) g_{t+1}
so the same doubling machinery runs over time-flipped chunks iterated in
reverse grid order, with (a_first, g_first) of the later chunk carried in
scratch. Within a chunk, h is recomputed from the saved start state
(recompute-in-backward, exactly like the reference CUDA kernel), and all
gradient contractions (dB, dC, du, ddelta, dA) are fused in VMEM.

v2 kernels (default; MLAGG_SCAN_{FWD,BWD}_V2=0 reverts to the doubling
kernels): time inside each chunk is factored as 128 contiguous
lane-segments x T sequential sublane-steps (operands pre-interleaved by
an XLA transpose that fuses into the producers). Each scan then costs a
T-step full-width sequential recurrence (~3 ops/element) plus ONE
doubling over the 128 segment summaries (~33/T ops/element) instead of a
full lc-wide doubling (~33 ops/element). Measured at flagship MSMM
shapes on v5e: forward kernel 32.6 -> 8.8 ms (3.7x), model forward
127.6 -> 89.5 ms.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _doubling_scan(a, b, lane, lc, reverse: bool = False,
                   skip_last_a: bool = False):
    """Cumulative first-order scan along the last (lane) axis:
    returns (a_msk, b_cum) with b_cum_k = sum_j (prod_{i>j..k} a_i) b_j.
    ``lane`` is a (1, 1, 1, lc) iota used for the single boundary mask.

    Select-free doubling: instead of masking every pass's wrap-around roll
    with a jnp.where, the validity mask is folded into ``a`` ONCE up front
    (the boundary lane's a is zeroed). By induction the masked a-chain
    then zeroes itself exactly on the lanes whose roll would wrap at each
    pass (â_{k+1} = â_k * roll(â_k) has zeros on lanes < 2^{k+1}), so both
    the b-combine and the a-chain need NO per-pass select — wrapped
    contributions are multiplied by an exact 0. That removes 13 of ~46
    vector ops per element at sub=128 (measured on the doubling's
    roll/select/mul/add budget). Identical results for all finite inputs.

    NOTE the returned a is the MASKED chain, not a_cum — every caller
    (forward + both backward scans) discards it (they fold the carry into
    b's boundary lane instead; skip_last_a elides the final a-pass too).
    reverse=True computes the mirrored (suffix) scan at identical op
    count (rolls wrap the other way, the boundary lane mirrors)."""
    boundary = lane == (lc - 1 if reverse else 0)
    a = jnp.where(boundary, 0.0, a)
    shift = 1
    while shift < lc:
        b_sh = pltpu.roll(b, lc - shift if reverse else shift, axis=3)
        b = b + a * b_sh
        if not (skip_last_a and shift * 2 >= lc):
            a_sh = pltpu.roll(a, lc - shift if reverse else shift, axis=3)
            a = a * a_sh
        shift *= 2
    return a, b


def _load_dt(dt_ref, bias_ref, softplus: bool):
    pre = dt_ref[...].astype(jnp.float32)                  # (gb, d, Lc)
    pre = pre + bias_ref[...].astype(jnp.float32)          # bias (gb, d, 1)
    dt = jax.nn.softplus(pre) if softplus else pre
    return pre, dt


def _fwd_kernel(u_ref, dt_ref, bias_ref, A_ref, B_ref, C_ref, D_ref,
                y_ref, h0_ref, h_scratch, *, lc: int, sub: int,
                state_every: int, softplus: bool, reverse: bool = False):
    """Forward over one (gb, d, lc) mega-chunk, iterated in ``sub``-lane
    sub-chunks. The loop is UNROLLED at trace time: a lax.fori_loop variant
    with pl.ds lane offsets measured 27% SLOWER (90.5 vs 71.4 ms at MSMM
    shapes) — dynamic VMEM addressing defeats Mosaic's static pipelining —
    so mega stays capped at 4 sub-chunks (Mosaic's stack allocator keeps
    every unrolled iteration's temporaries live; 8 iterations OOM VMEM).
    Chunk-start states are emitted every ``state_every`` lanes so the
    backward (which uses state_every-sized chunks) can recompute h.

    reverse=True runs the time-REVERSED recurrence (h_t = a_t h_{t+1} +
    b_t) on natural-order storage: sub-chunks iterate right-to-left, the
    doubling mirrors, and the emitted restart states are the states at each
    lc-chunk's RIGHT edge. The L-axis grid is iterated back-to-front by the
    caller's index maps. This replaces the cross-scan's explicit sequence
    flips for VMamba directions 2/3 (ops/cross_scan.py) — identical math,
    zero flip copies."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    A = A_ref[...].astype(jnp.float32)            # (gb, d, n)
    bias = bias_ref[...].astype(jnp.float32)      # (gb, d, 1)

    gb, d, n = A.shape[0], A.shape[1], A.shape[2]
    At = jnp.swapaxes(A, 1, 2)                    # (gb, n, d)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, sub), dimension=3)
    h0 = h_scratch[:, :, :d]                      # (gb, n, d)
    Df = D_ref[...].astype(jnp.float32)           # (gb, d, 1)

    subs = range(lc // sub)
    if reverse:
        subs = reversed(list(subs))
    # slice refs per sub-chunk so only (.., sub)-sized fp32 values are live
    for s in subs:
        sl = slice(s * sub, (s + 1) * sub)
        edge = (s * sub) if not reverse else (s * sub + sub - 1)
        if (edge % state_every == 0 if not reverse
                else (edge + 1) % state_every == 0):
            # stored (gb, db, n): db on the sublane axis keeps the block
            # legal for any 8-multiple db (n == full array dim on lanes)
            h0_ref[:, edge // state_every] = jnp.swapaxes(
                h0, 1, 2).astype(h0_ref.dtype)
        dt_s = dt_ref[:, :, sl].astype(jnp.float32) + bias
        if softplus:
            dt_s = jax.nn.softplus(dt_s)           # (gb, d, sub)
        u_s = u_ref[:, :, sl].astype(jnp.float32)
        Bm = B_ref[:, :, sl].astype(jnp.float32)   # (gb, n, sub)
        Cm = C_ref[:, :, sl].astype(jnp.float32)

        a = jnp.exp(dt_s[:, None, :, :] * At[:, :, :, None])
        bx = (dt_s * u_s)[:, None, :, :] * Bm[:, :, None, :]
        # fold the carry state into the boundary lane's b term so the scan
        # needs no per-lane a_cum (enables skip_last_a: the final — widest —
        # a-chain pass is elided)
        first = lane == (sub - 1 if reverse else 0)
        bx = jnp.where(first, bx + a * h0[:, :, :, None], bx)
        _, h = _doubling_scan(a, bx, lane, sub, reverse=reverse,
                              skip_last_a=True)     # (gb, n, d, sub)

        y = jnp.sum(h * Cm[:, :, None, :], axis=1) + Df * u_s
        y_ref[:, :, sl] = y.astype(y_ref.dtype)
        h0 = h[:, :, :, 0 if reverse else sub - 1]

    h_scratch[:, :, :d] = h0


def _fwd_kernel_v2(u_ref, dt_ref, bias_ref, A_ref, B_ref, C_ref, D_ref,
                   y_ref, h0_ref, h_scratch, *, mega: int, state_every: int,
                   softplus: bool, reverse: bool = False):
    """Two-phase blocked forward scan (v2). Time inside the mega-chunk is
    factored as ``time = s*T + t`` with S=128 contiguous segments on the
    LANE axis and T steps on a sequential (unrolled) loop:

      phase 1: h_loc[t] = a_t h_loc[t-1] + bx_t for t = 0..T-1 — every step
               is a full-width (gb, n, db, 128) vector op (1 fma + 1
               running-product mul per element), replacing the v1 doubling
               scan's ~33 ops/element;
      phase 2: one doubling scan over the 128 per-segment summaries
               (A_seg = prod_t a_t, H_seg = h_loc[T-1]) — its ~33
               ops/element are amortized by 1/T;
      phase 3: the true state is h_loc[t] + acum[t] * H_in[seg], fused
               directly into the y = sum_n(h*C) contraction.

    The mega-chunk's operands arrive PRE-INTERLEAVED from the wrapper
    (lane position t*128 + s holds time s*T + t — an XLA transpose that
    typically fuses into the producers), so the in-kernel (T, S) view is a
    FREE minor-128 split reshape; y is emitted interleaved and inverted by
    the wrapper. Net op count ~21/element vs ~42 for v1 at T=8.
    Same contract as _fwd_kernel: carry in VMEM scratch, backward-restart
    states emitted per ``state_every`` lanes, reverse=True fully mirrored
    (suffix-local phase 1, mirrored segment doubling, right-edge states).
    """
    S = 128
    T = mega // S
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    A = A_ref[...].astype(jnp.float32)            # (gb, db, n)
    bias = bias_ref[...].astype(jnp.float32)      # (gb, db, 1)
    gb, db, n = A.shape
    At = jnp.swapaxes(A, 1, 2)                    # (gb, n, db)
    Df = D_ref[...].astype(jnp.float32)           # (gb, db, 1)

    dt = dt_ref[...].astype(jnp.float32) + bias   # (gb, db, mega) interleaved
    if softplus:
        dt = jax.nn.softplus(dt)
    u = u_ref[...].astype(jnp.float32)
    dtu = dt * u
    Bf = B_ref[...].astype(jnp.float32)           # (gb, n, mega) interleaved
    Cf = C_ref[...].astype(jnp.float32)

    def st(x, t):                                 # step t = lanes [t*S,(t+1)*S)
        return x[:, :, t * S:(t + 1) * S]

    h0 = h_scratch[:, :, :db]                     # (gb, n, db)
    seg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), dimension=3)

    # ---- phase 1: sequential full-width recurrence (local, zero init)
    h = jnp.zeros((gb, n, db, S), jnp.float32)
    acc = None
    h_loc = [None] * T
    acum = [None] * T
    ts = range(T) if not reverse else range(T - 1, -1, -1)
    for i, t in enumerate(ts):
        a_t = jnp.exp(st(dt, t)[:, None] * At[:, :, :, None])
        bx_t = st(dtu, t)[:, None] * st(Bf, t)[:, :, None]
        h = a_t * h + bx_t
        acc = a_t if i == 0 else acc * a_t
        h_loc[t] = h
        acum[t] = acc

    # ---- phase 2: scan the 128 segment summaries
    bound = (S - 1) if reverse else 0
    Hseg = jnp.where(seg == bound, h + acc * h0[:, :, :, None], h)
    _, H_out = _doubling_scan(acc, Hseg, seg, S, reverse=reverse,
                              skip_last_a=True)   # (gb, n, db, S)
    if not reverse:
        H_in = jnp.where(seg == 0, h0[:, :, :, None],
                         pltpu.roll(H_out, 1, axis=3))
    else:
        H_in = jnp.where(seg == S - 1, h0[:, :, :, None],
                         pltpu.roll(H_out, S - 1, axis=3))

    # ---- backward-restart states (chunk k covers segments [k*c, (k+1)*c))
    c = state_every // T
    nstates = mega // state_every
    for k in range(nstates):
        if not reverse:
            hk = h0 if k == 0 else H_out[:, :, :, k * c - 1]
        else:
            hk = h0 if k == nstates - 1 else H_out[:, :, :, (k + 1) * c]
        h0_ref[:, k] = jnp.swapaxes(hk, 1, 2).astype(h0_ref.dtype)

    # ---- phase 3 + y contraction, fused per step; y stays interleaved
    # (the wrapper inverts the layout; step t = lanes [t*S, (t+1)*S)),
    # D*u is layout-independent
    for t in range(T):
        h_t = h_loc[t] + acum[t] * H_in
        y_t = (jnp.sum(h_t * st(Cf, t)[:, :, None], axis=1)
               + Df * st(u, t))
        y_ref[:, :, t * S:(t + 1) * S] = y_t.astype(y_ref.dtype)

    h_scratch[:, :, :db] = H_out[:, :, :, 0 if reverse else S - 1]


def _bwd_kernel_v2(u_ref, dt_ref, bias_ref, A_ref, B_ref, C_ref, D_ref,
                   gy_ref, h0_ref, du_ref, ddt_ref, dA_ref, dB_ref, dC_ref,
                   dDb_ref, carry_scratch, dA_scratch, dDb_scratch,
                   *, lc: int, softplus: bool, reverse: bool = False):
    """Two-phase blocked backward (v2): the lc-chunk's operands arrive
    PRE-INTERLEAVED (lane t*128+s holds time s*T+t, T = lc/128) and BOTH
    in-chunk scans — the h recompute and the adjoint g — run as T
    sequential full-width steps plus one 128-segment doubling each,
    replacing v1's two lc-wide doubling scans (~2x43 ops/element) with
    ~2x(5 + 33/T). The adjoint h_{t-1} (resp. h_{t+1} for reverse) needs
    no extra storage: at a segment's first step it IS the phase-2 H_in.
    du/ddt/dB/dC are emitted interleaved (the wrapper inverts); the
    (g, d)-shaped dA/dD/dbias reductions are lane-sum invariant.
    Same carry contract as _bwd_kernel: carry_scratch rows =
    (a, g) at the later-in-time chunk's first time (mirrored for
    reverse); grid walks chunks in reverse time order."""
    S = 128
    T = lc // S
    j = pl.program_id(2)
    nchunks = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        carry_scratch[:] = jnp.zeros_like(carry_scratch)
        dA_scratch[:] = jnp.zeros_like(dA_scratch)
        dDb_scratch[:] = jnp.zeros_like(dDb_scratch)

    A = A_ref[...].astype(jnp.float32)              # (gb, db, n)
    bias = bias_ref[...].astype(jnp.float32)        # (gb, db, 1)
    gb, db, n = A.shape
    At = jnp.swapaxes(A, 1, 2)                      # (gb, n, db)
    Df = D_ref[...].astype(jnp.float32)             # (gb, db, 1)

    pre = dt_ref[...].astype(jnp.float32) + bias    # (gb, db, lc) interleaved
    dt = jax.nn.softplus(pre) if softplus else pre
    u = u_ref[...].astype(jnp.float32)
    dtu = dt * u
    gy = gy_ref[...].astype(jnp.float32)
    Bf = B_ref[...].astype(jnp.float32)             # (gb, n, lc) interleaved
    Cf = C_ref[...].astype(jnp.float32)
    h0 = jnp.swapaxes(h0_ref[:, 0].astype(jnp.float32), 1, 2)  # (gb, n, db)

    def st(x, t):                                   # step t = lanes [t*S,(t+1)*S)
        return x[:, :, t * S:(t + 1) * S]

    seg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), dimension=3)
    a_carry = carry_scratch[0, :, :, :db]           # (gb, n, db)
    g_carry = carry_scratch[1, :, :, :db]

    # ---- recompute h (two-phase, same as the v2 forward)
    a = [None] * T
    h_loc = [None] * T
    acum = [None] * T
    h = jnp.zeros((gb, n, db, S), jnp.float32)
    acc = None
    ts = range(T) if not reverse else range(T - 1, -1, -1)
    for i, t in enumerate(ts):
        a[t] = jnp.exp(st(dt, t)[:, None] * At[:, :, :, None])
        bx_t = st(dtu, t)[:, None] * st(Bf, t)[:, :, None]
        h = a[t] * h + bx_t
        acc = a[t] if i == 0 else acc * a[t]
        h_loc[t] = h
        acum[t] = acc
    bound = (S - 1) if reverse else 0
    Hseg = jnp.where(seg == bound, h + acc * h0[:, :, :, None], h)
    _, H_out = _doubling_scan(acc, Hseg, seg, S, reverse=reverse,
                              skip_last_a=True)
    if not reverse:
        H_in = jnp.where(seg == 0, h0[:, :, :, None],
                         pltpu.roll(H_out, 1, axis=3))
    else:
        H_in = jnp.where(seg == S - 1, h0[:, :, :, None],
                         pltpu.roll(H_out, S - 1, axis=3))

    # ---- adjoint scan: g_t = G_t + a_{t+1} g_{t+1} (forward scans;
    # mirrored to a_{t-1} g_{t-1} for reverse scans)
    g_loc = [None] * T
    sacc = [None] * T
    g = None
    sa = None
    gs = range(T - 1, -1, -1) if not reverse else range(T)
    for i, t in enumerate(gs):
        G_t = st(gy, t)[:, None] * st(Cf, t)[:, :, None]
        if i == 0:
            g = G_t
            sa = jnp.ones((gb, n, db, S), jnp.float32)
        else:
            a_link = a[t + 1] if not reverse else a[t - 1]
            g = G_t + a_link * g
            sa = sa * a_link
        g_loc[t] = g
        sacc[t] = sa
    # link multiplier between segments: the a at the first time of the
    # NEXT segment in scan order (next chunk's first a at the boundary)
    if not reverse:
        a_edge = a[0]                               # a at segment starts
        a_nxt = jnp.where(seg == S - 1, a_carry[:, :, :, None],
                          pltpu.roll(a_edge, S - 1, axis=3))
        M = sacc[0] * a_nxt
        gseg = jnp.where(seg == S - 1, g_loc[0] + M * g_carry[:, :, :, None],
                         g_loc[0])
        _, Gtrue = _doubling_scan(M, gseg, seg, S, reverse=True,
                                  skip_last_a=True)
        G_in = jnp.where(seg == S - 1, g_carry[:, :, :, None],
                         pltpu.roll(Gtrue, S - 1, axis=3))
        W = a_nxt * G_in
        edge_s = 0
    else:
        a_edge = a[T - 1]                           # a at segment scan-starts
        a_nxt = jnp.where(seg == 0, a_carry[:, :, :, None],
                          pltpu.roll(a_edge, 1, axis=3))
        M = sacc[T - 1] * a_nxt
        gseg = jnp.where(seg == 0, g_loc[T - 1] + M * g_carry[:, :, :, None],
                         g_loc[T - 1])
        _, Gtrue = _doubling_scan(M, gseg, seg, S, reverse=False,
                                  skip_last_a=True)
        G_in = jnp.where(seg == 0, g_carry[:, :, :, None],
                         pltpu.roll(Gtrue, 1, axis=3))
        W = a_nxt * G_in
        edge_s = S - 1

    # carry for the next grid step (earlier chunk for forward scans,
    # later chunk for reverse scans): (a, g_true) at this chunk's
    # scan-entry time
    carry_scratch[0, :, :, :db] = a_edge[:, :, :, edge_s]
    carry_scratch[1, :, :, :db] = Gtrue[:, :, :, edge_s]

    # ---- per-step correction + gradient contractions
    dA_acc = None
    dD_acc = None
    dbias_acc = None
    h_prev = None
    steps = range(T) if not reverse else range(T - 1, -1, -1)
    for i, t in enumerate(steps):
        g_t = g_loc[t] + sacc[t] * W
        h_t = h_loc[t] + acum[t] * H_in
        h_adj = H_in if i == 0 else h_prev
        h_prev = h_t
        dda = g_t * h_adj * a[t]
        gy_t = st(gy, t)
        u_t = st(u, t)
        dt_t = st(dt, t)
        gB = jnp.sum(g_t * st(Bf, t)[:, :, None], axis=1)   # (gb, db, S)
        du_t = dt_t * gB + Df * gy_t
        du_ref[:, :, t * S:(t + 1) * S] = du_t.astype(du_ref.dtype)
        ddt_t = u_t * gB + jnp.sum(dda * At[:, :, :, None], axis=1)
        if softplus:
            ddt_t = ddt_t * jax.nn.sigmoid(st(pre, t))
        ddt_ref[:, :, t * S:(t + 1) * S] = ddt_t.astype(ddt_ref.dtype)
        dB_t = jnp.sum(g_t * st(dtu, t)[:, None], axis=2)   # (gb, n, S)
        dB_ref[:, 0, :, t * S:(t + 1) * S] = dB_t.astype(dB_ref.dtype)
        dC_t = jnp.sum(h_t * gy_t[:, None], axis=2)
        dC_ref[:, 0, :, t * S:(t + 1) * S] = dC_t.astype(dC_ref.dtype)
        dA_t = jnp.sum(dda * dt_t[:, None], axis=3)         # (gb, n, db)
        dA_acc = dA_t if i == 0 else dA_acc + dA_t
        dD_t = jnp.sum(gy_t * u_t, axis=2)                  # (gb, db)
        dD_acc = dD_t if i == 0 else dD_acc + dD_t
        db_t = jnp.sum(ddt_t, axis=2)
        dbias_acc = db_t if i == 0 else dbias_acc + db_t

    dA_scratch[:, :, :db] += dA_acc
    dDb_scratch[0, :, :db] += dD_acc
    dDb_scratch[1, :, :db] += dbias_acc

    @pl.when(j == nchunks - 1)
    def _():
        dA_ref[...] = jnp.swapaxes(dA_scratch[:, :, :db], 1, 2
                                   ).astype(dA_ref.dtype)
        dDb_ref[...] = jnp.transpose(dDb_scratch[:, :, :db], (1, 2, 0)
                                     ).astype(dDb_ref.dtype)


def _bwd_kernel(u_ref, dt_ref, bias_ref, A_ref, B_ref, C_ref, D_ref, gy_ref,
                h0_ref, du_ref, ddt_ref, dA_ref, dB_ref, dC_ref, dDb_ref,
                carry_scratch, dA_scratch, dDb_scratch,
                *, lc: int, softplus: bool, reverse: bool = False):
    """Processes chunks in REVERSE time order (index_map flips j).
    carry_scratch: (2, gb, n, d_pad) rows = (a_first, g_first) of the
    later-in-time chunk. dA accumulates across chunks in scratch; so do the
    per-row dD and dbias partial sums (dDb_scratch rows 0/1), emitted once
    per grid row as dDb_ref. ddt_ref receives the FINAL ddelta (the
    softplus/bias chain is applied in-kernel).

    reverse=True is the backward of a reverse=True forward, fully mirrored:
    chunks iterate FORWARD (natural index maps), h is recomputed by the
    MIRRORED doubling from the saved chunk-RIGHT-edge states, the adjoint
    recurrence g_t = G_t + a_{t-1} g_{t-1} runs left-to-right, and da uses
    h_{t+1} instead of h_{t-1}. No operand/grad flips anywhere."""
    j = pl.program_id(2)
    nchunks = pl.num_programs(2)

    u = u_ref[...].astype(jnp.float32)              # (gb, d, Lc)
    pre, dt = _load_dt(dt_ref, bias_ref, softplus)  # (gb, d, Lc)
    A = A_ref[...].astype(jnp.float32)              # (gb, d, n)
    Bm = B_ref[...].astype(jnp.float32)             # (gb, n, Lc)
    Cm = C_ref[...].astype(jnp.float32)             # (gb, n, Lc)
    gy = gy_ref[...].astype(jnp.float32)            # (gb, d, Lc)
    h0 = jnp.swapaxes(h0_ref[:, 0].astype(jnp.float32), 1, 2)  # (gb, n, d)

    gb, d, n = A.shape[0], A.shape[1], A.shape[2]
    At = jnp.swapaxes(A, 1, 2)                      # (gb, n, d)

    @pl.when(j == 0)
    def _():
        carry_scratch[:] = jnp.zeros_like(carry_scratch)
        dA_scratch[:] = jnp.zeros_like(dA_scratch)
        dDb_scratch[:] = jnp.zeros_like(dDb_scratch)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, lc), dimension=3)

    # ---- recompute within-chunk a, bx, h from the saved boundary state
    a = jnp.exp(dt[:, None, :, :] * At[:, :, :, None])       # (gb, n, d, Lc)
    s = dt * u                                                # (gb, d, Lc)
    bx = s[:, None, :, :] * Bm[:, :, None, :]
    first = lane == (lc - 1 if reverse else 0)
    bx = jnp.where(first, bx + a * h0[:, :, :, None], bx)
    _, h = _doubling_scan(a, bx, lane, lc, reverse=reverse,
                          skip_last_a=True)                   # h_t
    if not reverse:
        h_adj = pltpu.roll(h, 1, axis=3)                      # h_{t-1}
        h_adj = jnp.where(lane >= 1, h_adj, h0[:, :, :, None])
    else:
        h_adj = pltpu.roll(h, lc - 1, axis=3)                 # h_{t+1}
        h_adj = jnp.where(lane <= lc - 2, h_adj, h0[:, :, :, None])

    # ---- adjoint recurrence. forward scan: g_t = G_t + a_{t+1} g_{t+1}
    # (right-to-left doubling, carry from the LATER chunk); reverse scan:
    # g_t = G_t + a_{t-1} g_{t-1} (left-to-right doubling, carry from the
    # EARLIER chunk).
    G = gy[:, None, :, :] * Cm[:, :, None, :]                 # (gb, n, d, Lc)
    a_carry = carry_scratch[0, :, :, :d]                      # (gb, n, d)
    g_carry = carry_scratch[1, :, :, :d]
    if not reverse:
        m = pltpu.roll(a, lc - 1, axis=3)                     # m_t = a_{t+1}
        m = jnp.where(lane <= lc - 2, m, a_carry[:, :, :, None])
    else:
        m = pltpu.roll(a, 1, axis=3)                          # m_t = a_{t-1}
        m = jnp.where(lane >= 1, m, a_carry[:, :, :, None])
    # solve g_t = G_t + m_t g_{t±1} by doubling in the matching direction
    # (carry folded into the boundary lane, same trick as the forward)
    gfirst = lane == (0 if reverse else lc - 1)
    G = jnp.where(gfirst, G + m * g_carry[:, :, :, None], G)
    _, g = _doubling_scan(m, G, lane, lc, reverse=not reverse,
                          skip_last_a=True)                   # (gb, n, d, Lc)

    # save carry for the next grid step (earlier chunk for forward scans,
    # later chunk for reverse scans)
    edge = 0 if not reverse else lc - 1
    carry_scratch[0, :, :, :d] = a[:, :, :, edge]
    carry_scratch[1, :, :, :d] = g[:, :, :, edge]

    # ---- gradient contractions
    da = g * h_adj                                            # (gb, n, d, Lc)
    gB = jnp.sum(g * Bm[:, :, None, :], axis=1)               # (gb, d, Lc)
    D = D_ref[...].astype(jnp.float32)                        # (gb, d, 1)
    du_ref[...] = (dt * gB + D * gy).astype(du_ref.dtype)
    ddt = u * gB + jnp.sum(da * a * At[:, :, :, None], axis=1)
    if softplus:
        ddt = ddt * jax.nn.sigmoid(pre)
    ddt_ref[...] = ddt.astype(ddt_ref.dtype)
    dB_ref[:, 0] = jnp.sum(g * s[:, None, :, :], axis=2).astype(dB_ref.dtype)
    dC_ref[:, 0] = jnp.sum(h * gy[:, None, :, :], axis=2).astype(dC_ref.dtype)
    dA_scratch[:, :, :d] += jnp.sum(da * a * dt[:, None, :, :], axis=3)
    dDb_scratch[0, :, :d] += jnp.sum(gy * u, axis=2)          # dD partial
    dDb_scratch[1, :, :d] += jnp.sum(ddt, axis=2)             # dbias partial

    @pl.when(j == nchunks - 1)
    def _():
        dA_ref[...] = jnp.swapaxes(dA_scratch[:, :, :d], 1, 2
                                   ).astype(dA_ref.dtype)
        # (2, gb, d) -> (gb, d, 2): the tiny axis of size 2 sits on lanes
        # where it equals the full array dim (legal for any db)
        dDb_ref[...] = jnp.transpose(dDb_scratch[:, :, :d], (1, 2, 0)
                                     ).astype(dDb_ref.dtype)


# VMEM sizing: the BACKWARD kernel is the constraint — it keeps ~9
# (gb, n, db, lc) fp32 tensors live (a/bx/cums/h/h_prev/G/m/v/g/da with
# Mosaic's buffer reuse); 16MB VMEM minus operand blocks + DMA headroom
# leaves ~14MB for them. The forward iterates in _FWD_SUB sub-chunks so
# its working set is smaller at the same (db, lc).
_VMEM_BUDGET = 14 * 1024 * 1024
_LIVE_TENSORS = 9

# Interleaved-operand mode (MSMM fast path): the caller pre-lays the L
# axis out in the v2 kernels' (S=128, T) order at this fixed granularity
# and passes interleaved=True — the wrapper's own per-operand interleave
# shuffles (measured ~7.3 ms of a 16 ms scan call at MSMM shapes, v5e
# 2026-08-21) disappear because the producer's layout transform composes
# them for free. Contract: L % IL_MEGA == 0 and within each IL_MEGA-lane
# chunk, storage lane t*128 + s holds logical time s*T + t (T =
# IL_MEGA/128). Forward mega and backward chunk are BOTH forced to
# IL_MEGA so fwd/bwd/y/gy all share one layout and no conversion is ever
# needed inside the vjp.
IL_MEGA = 1024


def interleaved_scan_ok(b: int, g: int, d: int, n: int) -> bool:
    """True iff interleaved=True is supported for these shapes: both v2
    kernels active and the forward geometry admits mega == IL_MEGA."""
    if not (_fwd_v2() and _bwd_v2()):
        return False
    dp = d + ((-d) % 8)
    geo = _fwd_geometry_v2(b * g, dp, n, IL_MEGA, IL_MEGA)
    return geo[2] == IL_MEGA


def _scan_bytes(gb: int, n: int, db: int, lc: int) -> int:
    return gb * n * db * lc * 4 * _LIVE_TENSORS


def _pick_db_lc(dp: int, n: int, lc0: int):
    """d-block + chunk length: the recurrence is independent per channel,
    so wide models (d_inner up to 768 in VMamba stage-3 cells) split the
    d axis across grid cells. Prefer the largest db (fewest B/C re-reads),
    then the largest lc (fewest grid cells)."""
    def max_db(lc):
        for k in range(1, dp // 8 + 1):
            if dp % k:
                continue
            db = dp // k
            if db % 8 == 0 and _scan_bytes(1, n, db, lc) <= _VMEM_BUDGET:
                return db
        return None

    best = (8, 128)
    lc = lc0
    while lc >= 128:
        db = max_db(lc)
        if db and (db, lc) > best:
            best = (db, lc)
        lc //= 2
    return best


def _pick_gb(BG: int, n: int, db: int, lc: int) -> int:
    """Rows per grid cell: amortize fixed per-cell overhead when the
    working set leaves room."""
    import os

    forced = os.environ.get("MLAGG_SCAN_GB")
    if forced:
        gbf = int(forced)
        if gbf > 0 and BG % gbf == 0:
            return gbf
        # a non-dividing override would truncate the grid and leave the
        # last BG % gbf rows unwritten — ignore it and pick automatically
    for gb in (8, 4, 2):
        if BG % gb == 0 and _scan_bytes(gb, n, db, lc) <= _VMEM_BUDGET:
            return gb
    return 1


def _choose_geometry(L: int, d: int, n: int, chunk_size: int):
    """(lc, db_bwd, pad_d) for the given problem size. Shared by the
    wrapper and by padded_scan_len so callers can pre-pad L and make the
    wrapper's own pad/slice a no-op."""
    # Bigger chunks amortize per-grid-cell overhead (measured: lc=512 beats
    # lc=128 by ~14% at MSMM shapes); the joint (db, lc) choice keeps the
    # backward's working set inside VMEM.
    lc = max(128, min(chunk_size, 1024))
    lc = min(lc, max(128, L))
    # lc MUST be a power of two: the forward iterates its mega-chunk in
    # _FWD_SUB-lane sub-chunks and emits backward-restart states every lc
    # lanes — both alignments are exact only when sub | lc | mega, which a
    # power-of-two lc guarantees (non-power lc, e.g. L=320 -> lc=320, left
    # the final mega tail lanes unwritten).
    lc = 1 << (lc.bit_length() - 1)
    pad_d = (-d) % 8
    db, lc = _pick_db_lc(d + pad_d, n, lc)
    return lc, db, pad_d


def padded_scan_len(L: int, d: int, n: int, chunk_size: int = 512,
                    bg: int = 8) -> int:
    """Smallest Lp >= L such that inputs of logical length Lp hit the
    zero-copy path (no pad, no slice) inside selective_scan_pallas. Callers
    (e.g. the MSMM cross-scan) append an all-zero tail up to Lp during their
    own concat — the scan is causal so the real region is unaffected, and
    the tail is simply never read back. Iterated to a fixpoint so the
    wrapper's own mega choice on the padded length agrees."""
    pad_d = (-d) % 8
    Lp = L
    for _ in range(5):
        lc, _, _ = _choose_geometry(Lp, d, n, chunk_size)
        _, _, mega, _ = _fwd_geometry(bg, d + pad_d, n, lc, Lp)
        nxt = Lp + (-Lp) % mega
        if nxt == Lp:
            return Lp
        Lp = nxt
    return Lp


def _prep_padded(u, delta, A, B, C, D, delta_bias, chunk_size,
                 interleaved: bool = False):
    """Pad/flatten operands. u/delta/B/C keep their input dtype (the kernels
    upcast in VMEM); bias+softplus and the D*u term are applied in-kernel.
    interleaved=True (see IL_MEGA) forces lc = mega = IL_MEGA so the
    caller-provided lane order is used as-is by both kernels."""
    b, g, d, L = u.shape
    n = A.shape[-1]
    BG = b * g

    if interleaved:
        assert L % IL_MEGA == 0, (L, IL_MEGA)
        pad_d = (-d) % 8
        lc, mega = IL_MEGA, IL_MEGA
        db = 8  # only consulted by the non-v2 paths, which assert off
    else:
        lc, db, pad_d = _choose_geometry(L, d, n, chunk_size)
        _, _, mega, _ = _fwd_geometry(BG, d + pad_d, n, lc, L)
    pad_l = (-L) % mega
    if pad_l or pad_d:
        u_p = jnp.pad(u, ((0, 0), (0, 0), (0, pad_d), (0, pad_l)))
        dt_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_d), (0, pad_l)))
        B_p = jnp.pad(B, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
        C_p = jnp.pad(C, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
        A_p = jnp.pad(A, ((0, 0), (0, pad_d), (0, 0)))
    else:
        u_p, dt_p, B_p, C_p, A_p = u, delta, B, C, A
    dp, Lp = d + pad_d, L + pad_l
    nchunks = Lp // lc
    gb = _pick_gb(BG, n, db, lc)

    shapes = dict(b=b, g=g, d=d, L=L, n=n, BG=BG, dp=dp, Lp=Lp, lc=lc,
                  nchunks=nchunks, gb=gb, db=db, mega=mega)
    u_f = u_p.reshape(BG, dp, Lp)
    dt_f = dt_p.reshape(BG, dp, Lp)
    B_f = B_p.reshape(BG, n, Lp)
    C_f = C_p.reshape(BG, n, Lp)
    A_f = jnp.broadcast_to(A_p.astype(jnp.float32)[None], (b, g, dp, n)
                           ).reshape(BG, dp, n)

    def bcast_gd(x):
        if x is None:
            x_p = jnp.zeros((g, dp), jnp.float32)
        else:
            x_p = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad_d)))
        return jnp.broadcast_to(x_p[None], (b, g, dp)).reshape(BG, dp, 1)

    return (u_f, dt_f, bcast_gd(delta_bias), A_f, B_f, C_f, bcast_gd(D),
            shapes)


def _interpret():
    return jax.default_backend() != "tpu"


_FWD_SUB = 128          # doubling-scan sub-chunk (lanes; 128 = one full
                        # lane tile with the fewest doubling passes)
_FWD_MEGA_SUBS = 4      # mega-chunk = at most 4 unrolled sub-chunks (8 OOM
                        # VMEM; a rolled fori_loop measured 27% slower)


def _fwd_v2() -> bool:
    import os

    return os.environ.get("MLAGG_SCAN_FWD_V2", "1") != "0"


def _bwd_v2() -> bool:
    import os

    return os.environ.get("MLAGG_SCAN_BWD_V2", "1") != "0"


def _bwd_geometry_v2(BG: int, dp: int, n: int, lc: int):
    """(gb, db) for the v2 backward. Live VMEM is dominated by the ~6T+10
    (gb, n, db, 128) fp32 tensors (a[t], h_loc[t], acum[t], g_loc[t],
    sacc[t], per-step temporaries + the H/G phase-2 machinery)."""
    T = lc // 128

    def fits(gb, db):
        rec = (6 * T + 10) * gb * n * db * 128 * 4
        io = 2 * gb * (3 * db * lc * 2 + 2 * n * lc * 2 + 2 * db * lc * 4
                       + 2 * n * lc * 4)
        return rec + io <= _VMEM_BUDGET

    db = 8
    for k in range(1, dp // 8 + 1):
        if dp % k:
            continue
        cand = dp // k
        if cand % 8 == 0 and fits(1, cand):
            db = cand
            break
    gb = 1
    for g_ in (8, 4, 2):
        if BG % g_ == 0 and fits(g_, db):
            gb = g_
            break
    return gb, db


def _fwd_geometry_v2(BG: int, dp: int, n: int, lc: int, L: int):
    """v2 geometry: mega = k*lc lanes processed as T = mega/128 sequential
    steps over 128 lane-segments. VMEM is dominated by the 2T+~6 live
    (gb, n, db, 128) fp32 recurrence tensors (h_loc[t], acum[t], phase-2/3
    temporaries), plus the interleaved d-/n-sized inputs and the
    double-buffered IO blocks."""

    def fits(gb, db, mega):
        T = mega // 128
        rec = (2 * T + 6) * gb * n * db * 128 * 4
        inter = gb * (3 * db + 2 * n) * mega * 4
        io = 2 * gb * (2 * db * mega * 2 + 2 * n * mega * 2 + db * mega * 4)
        states = 2 * gb * max(1, mega // lc) * db * n * 4
        return rec + inter + io + states <= _VMEM_BUDGET

    # prefer the largest T (amortizes the phase-2 doubling), then db, then gb
    best = None
    for mega in (8 * lc, 4 * lc, 2 * lc, lc):
        if mega > 1024 or mega % 128 or lc % (mega // 128):
            continue
        if (-L) % mega > max(L // 8, lc):
            continue
        db = None
        for k in range(1, dp // 8 + 1):
            if dp % k:
                continue
            cand = dp // k
            if cand % 8 == 0 and fits(1, cand, mega):
                db = cand
                break
        if db is None:
            continue
        gb = 1
        for g_ in (8, 4, 2):
            if BG % g_ == 0 and fits(g_, db, mega):
                gb = g_
                break
        if best is None or mega > best[2]:
            best = (gb, db, mega, 128)
    if best is None:
        best = (1, 8, lc, 128)
    return best


def _fwd_geometry(BG: int, dp: int, n: int, lc: int, L: int):
    """Forward-specific (gb, db, mega, sub). Unlike the backward (whose
    doubling temporaries are lc-sized), the forward iterates its mega-chunk
    in sub-lane sub-chunks, so its live fp32 temporaries are the unrolled
    iterations' (gb, n, db, sub) sets — it can afford much larger d-blocks
    / row groups than the backward. IO blocks (u/dt/B/C/y at mega lanes)
    are double-buffered by Pallas."""
    import os

    if _fwd_v2():
        return _fwd_geometry_v2(BG, dp, n, lc, L)

    sub = int(os.environ.get("MLAGG_SCAN_FWD_SUB", 0)) or min(_FWD_SUB, lc)
    sub = min(sub, lc)
    live = int(os.environ.get("MLAGG_SCAN_FWD_LIVE", 0)) or 13

    def fits(gb, db, mega):
        # ~13 live fp32 (gb,n,db,sub) temporaries per unrolled sub-chunk
        # iteration (doubling-scan a/b/shifts + h/y), measured against
        # Mosaic's scoped-vmem accounting
        temps = live * gb * n * db * sub * 4
        io = 2 * gb * (2 * db * mega * 2 + 2 * n * mega * 2 + db * mega * 4)
        states = 2 * gb * max(1, mega // lc) * db * n * 4
        return temps + io + states <= _VMEM_BUDGET

    mega_cap = max(lc, _FWD_MEGA_SUBS * sub)
    db = 8
    for k in range(1, dp // 8 + 1):
        if dp % k:
            continue
        cand = dp // k
        if cand % 8 == 0 and fits(1, cand, lc):
            db = cand
            break
    gb = 1
    for g_ in (8, 4, 2):
        if BG % g_ == 0 and fits(g_, db, lc):
            gb = g_
            break
    mega = lc
    while (mega * 2 <= mega_cap and fits(gb, db, mega * 2)
           and (-L) % (mega * 2) <= L // 8):
        mega *= 2
    return gb, db, mega, sub


def _pallas_forward(u, delta, A, B, C, D, delta_bias, delta_softplus,
                    chunk_size, with_states: bool = False,
                    reverse: bool = False, interleaved: bool = False):
    u_f, dt_f, bias_f, A_f, B_f, C_f, D_f, s = _prep_padded(
        u, delta, A, B, C, D, delta_bias, chunk_size,
        interleaved=interleaved)
    b, g, d, L, n = s["b"], s["g"], s["d"], s["L"], s["n"]
    BG, dp, Lp, lc = s["BG"], s["dp"], s["Lp"], s["lc"]
    nchunks = s["nchunks"]

    # forward mega-chunks: rolled sub-chunk iteration keeps VMEM flat, so
    # use bigger grid cells than the backward's doubling chunk (same call
    # as _prep_padded's, so Lp % mega == 0 holds)
    if interleaved:
        assert _fwd_v2(), "interleaved mode requires the v2 forward kernel"
        gb, db, mega, sub = _fwd_geometry_v2(BG, dp, n, IL_MEGA, Lp)
        assert mega == IL_MEGA, (
            f"interleaved scan: geometry rejected mega={IL_MEGA} "
            f"(got {mega}); gate the caller on interleaved_scan_ok()")
    else:
        gb, db, mega, sub = _fwd_geometry(BG, dp, n, lc, L)
    nmega = Lp // mega
    states_per_mega = mega // lc
    v2 = _fwd_v2()
    T = mega // 128
    if v2:
        # v2 invariants: 128 lane-segments of T = mega/128 steps each; every
        # state-emission point (every lc lanes) lands on a segment boundary
        assert mega % 128 == 0 and mega % lc == 0 and lc % (mega // 128) == 0, (
            f"scan v2 chunking misaligned: mega={mega} lc={lc}")
        kernel = functools.partial(_fwd_kernel_v2, mega=mega, state_every=lc,
                                   softplus=delta_softplus, reverse=reverse)
        if T > 1 and not interleaved:
            # per-mega (S, T) interleave: lane t*128+s <- time s*T+t. An XLA
            # transpose at HBM that usually fuses into the producers; the
            # kernel's (T, S) view is then a free minor-128 split.
            # (interleaved=True: the caller already laid the operands out
            # this way — see IL_MEGA — and y is returned interleaved too.)
            def il(x):
                c = x.shape[1]
                return (x.reshape(BG, c, nmega, 128, T).swapaxes(-1, -2)
                        .reshape(BG, c, Lp))

            u_f, dt_f, B_f, C_f = il(u_f), il(dt_f), il(B_f), il(C_f)
    else:
        # alignment invariants: every lane is covered by exactly one
        # sub-chunk and every state-emission point is a sub-chunk start
        assert mega % sub == 0 and lc % sub == 0 and mega % lc == 0, (
            f"scan chunking misaligned: mega={mega} lc={lc} sub={sub}")
        kernel = functools.partial(_fwd_kernel, lc=mega, sub=sub,
                                   state_every=lc, softplus=delta_softplus,
                                   reverse=reverse)

    # reverse: iterate megas back-to-front so the VMEM state flows
    # right-to-left; the kernel mirrors its sub-chunk loop and doubling
    rj = nmega - 1

    def lmap(i, jd, j):
        return (i, jd, rj - j if reverse else j)

    def lmap_n(i, jd, j):
        return (i, 0, rj - j if reverse else j)

    def smap(i, jd, j):
        return (i, rj - j if reverse else j, jd, 0)

    grid = (BG // gb, dp // db, nmega)
    y, h0_states = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gb, db, mega), lmap),
            pl.BlockSpec((gb, db, mega), lmap),
            pl.BlockSpec((gb, db, 1), lambda i, jd, j: (i, jd, 0)),
            pl.BlockSpec((gb, db, n), lambda i, jd, j: (i, jd, 0)),
            pl.BlockSpec((gb, n, mega), lmap_n),
            pl.BlockSpec((gb, n, mega), lmap_n),
            pl.BlockSpec((gb, db, 1), lambda i, jd, j: (i, jd, 0)),
        ],
        out_specs=(
            pl.BlockSpec((gb, db, mega), lmap),
            pl.BlockSpec((gb, states_per_mega, db, n), smap),
        ),
        out_shape=(
            # y stays fp32: the reference keeps the scan output fp32 even
            # under AMP (MambaSkip.py:437,452,532-534) and sums the four
            # direction outputs in fp32 before out_norm; emitting bf16 here
            # saved only ~0.4 ms/forward (y ~150 MB of a ~57 GB forward)
            jax.ShapeDtypeStruct((BG, dp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, nchunks, dp, n), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((gb, n, max(db, 128)), jnp.float32)],
        interpret=_interpret(),
    )(u_f, dt_f, bias_f, A_f, B_f, C_f, D_f)

    if v2 and T > 1 and not interleaved:
        y = (y.reshape(BG, dp, nmega, T, 128).swapaxes(-1, -2)
             .reshape(BG, dp, Lp))
    y = y.reshape(b, g, dp, Lp)[:, :, :d, :L]
    if with_states:
        return y, h0_states
    return y


def _pallas_backward(u, delta, A, B, C, D, delta_bias, delta_softplus,
                     chunk_size, h0_states, gy, reverse: bool = False,
                     interleaved: bool = False):
    """Returns (du, ddelta, dA, dB, dC, dD, dbias) matching input shapes.

    reverse=True computes the backward of a reverse=True forward NATIVELY
    (no flip copies): the kernel runs fully mirrored (see _bwd_kernel) over
    natural chunk order, consuming the reverse forward's right-edge restart
    states directly.

    interleaved=True: operands AND gy arrive in IL_MEGA lane order (the
    forward emitted y interleaved), lc == IL_MEGA so the kernel consumes
    them as-is, and du/ddt/dB/dC are returned interleaved — matching the
    primal input layout, as custom_vjp requires."""
    if interleaved:
        assert _bwd_v2(), "interleaved mode requires the v2 backward kernel"
    u_f, dt_f, bias_f, A_f, B_f, C_f, D_f, s = _prep_padded(
        u, delta, A, B, C, D, delta_bias, chunk_size,
        interleaved=interleaved)
    b, g, d, L, n = s["b"], s["g"], s["d"], s["L"], s["n"]
    BG, dp, Lp, lc = s["BG"], s["dp"], s["Lp"], s["lc"]
    nchunks, gb = s["nchunks"], s["gb"]

    gy_f = gy.astype(jnp.float32)
    if Lp != L or dp != d:
        gy_f = jnp.pad(gy_f, ((0, 0), (0, 0), (0, dp - d), (0, Lp - L)))
    gy_f = gy_f.reshape(BG, dp, Lp)

    db = s["db"]
    v2 = _bwd_v2()
    T = lc // 128
    if v2:
        gb, db = _bwd_geometry_v2(BG, dp, n, lc)
        if T > 1 and not interleaved:
            # per-chunk (S, T) interleave, same convention as the forward
            def il(x):
                c = x.shape[1]
                return (x.reshape(BG, c, nchunks, 128, T).swapaxes(-1, -2)
                        .reshape(BG, c, Lp))

            u_f, dt_f, B_f, C_f, gy_f = (il(u_f), il(dt_f), il(B_f),
                                         il(C_f), il(gy_f))
        kernel = functools.partial(_bwd_kernel_v2, lc=lc,
                                   softplus=delta_softplus, reverse=reverse)
    else:
        kernel = functools.partial(_bwd_kernel, lc=lc,
                                   softplus=delta_softplus, reverse=reverse)
    grid = (BG // gb, dp // db, nchunks)
    # forward scans process chunks back-to-front (the adjoint recurrence
    # flows right-to-left); reverse scans mirror everything, so their
    # backward walks the chunks front-to-back with natural index maps
    rev = nchunks - 1

    def lmap(i, jd, j):
        return (i, jd, j if reverse else rev - j)

    def lmap_n(i, jd, j):
        return (i, 0, j if reverse else rev - j)

    def smap(i, jd, j):
        return (i, j if reverse else rev - j, jd, 0)

    def omap_bc(i, jd, j):
        return (i, jd, 0, j if reverse else rev - j)

    du_c, ddt_c, dA_c, dB_c, dC_c, dDb_c = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gb, db, lc), lmap),
            pl.BlockSpec((gb, db, lc), lmap),
            pl.BlockSpec((gb, db, 1), lambda i, jd, j: (i, jd, 0)),
            pl.BlockSpec((gb, db, n), lambda i, jd, j: (i, jd, 0)),
            pl.BlockSpec((gb, n, lc), lmap_n),
            pl.BlockSpec((gb, n, lc), lmap_n),
            pl.BlockSpec((gb, db, 1), lambda i, jd, j: (i, jd, 0)),
            pl.BlockSpec((gb, db, lc), lmap),
            pl.BlockSpec((gb, 1, db, n), smap),
        ],
        out_specs=(
            pl.BlockSpec((gb, db, lc), lmap),
            pl.BlockSpec((gb, db, lc), lmap),
            pl.BlockSpec((gb, db, n), lambda i, jd, j: (i, jd, 0)),
            pl.BlockSpec((gb, 1, n, lc), omap_bc),
            pl.BlockSpec((gb, 1, n, lc), omap_bc),
            pl.BlockSpec((gb, db, 2), lambda i, jd, j: (i, jd, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BG, dp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, dp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, dp, n), jnp.float32),
            jax.ShapeDtypeStruct((BG, dp // db, n, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, dp // db, n, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, dp, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, gb, n, max(dp, 128)), jnp.float32),
            pltpu.VMEM((gb, n, max(dp, 128)), jnp.float32),
            pltpu.VMEM((2, gb, max(dp, 128)), jnp.float32),
        ],
        interpret=_interpret(),
    )(u_f, dt_f, bias_f, A_f, B_f, C_f, D_f, gy_f, h0_states)

    if v2 and T > 1 and not interleaved:
        def uil(x):                                 # inverse interleave
            c = x.shape[1]
            return (x.reshape(BG, c, nchunks, T, 128).swapaxes(-1, -2)
                    .reshape(BG, c, Lp))

        du_c, ddt_c = uil(du_c), uil(ddt_c)
        dB_c = uil(dB_c.reshape(BG, -1, Lp)).reshape(dB_c.shape)
        dC_c = uil(dC_c.reshape(BG, -1, Lp)).reshape(dC_c.shape)
    du = du_c.reshape(b, g, dp, Lp)[:, :, :d, :L]
    ddelta = ddt_c.reshape(b, g, dp, Lp)[:, :, :d, :L]
    dA_bg = dA_c.reshape(b, g, dp, n)[:, :, :d, :]
    dA = dA_bg.sum(0)                                       # (g, d, n)
    dB = dB_c.sum(1).reshape(b, g, n, Lp)[..., :L]
    dC = dC_c.sum(1).reshape(b, g, n, Lp)[..., :L]

    dD_rows = dDb_c[:, :, 0].reshape(b, g, dp)[..., :d]
    dbias_rows = dDb_c[:, :, 1].reshape(b, g, dp)[..., :d]
    dD = dD_rows.sum(0) if D is not None else None          # (g, d)
    dbias = dbias_rows.sum(0) if delta_bias is not None else None

    return (du.astype(u.dtype), ddelta.astype(delta.dtype),
            dA.astype(A.dtype), dB.astype(B.dtype), dC.astype(C.dtype),
            None if dD is None else dD.astype(D.dtype),
            None if dbias is None else dbias.astype(delta_bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                           delta_softplus, chunk_size, reverse,
                           interleaved):
    return _pallas_forward(u, delta, A, B, C, D, delta_bias,
                           delta_softplus, chunk_size, reverse=reverse,
                           interleaved=interleaved)


def _fwd(u, delta, A, B, C, D, delta_bias, delta_softplus, chunk_size,
         reverse, interleaved):
    y, h0_states = _pallas_forward(u, delta, A, B, C, D, delta_bias,
                                   delta_softplus, chunk_size,
                                   with_states=True, reverse=reverse,
                                   interleaved=interleaved)
    return y, (u, delta, A, B, C, D, delta_bias, h0_states)


def _bwd(delta_softplus, chunk_size, reverse, interleaved, res, gy):
    u, delta, A, B, C, D, delta_bias, h0_states = res
    return _pallas_backward(u, delta, A, B, C, D, delta_bias,
                            delta_softplus, chunk_size, h0_states, gy,
                            reverse=reverse, interleaved=interleaved)


_selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_pallas(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    chunk_size: int = 512,
    reverse: bool = False,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Same contract as ops.selective_scan.selective_scan:
    u/delta (b,g,d,l); A (g,d,n); B/C (b,g,n,l); D/delta_bias (g,d).

    reverse=True scans each row right-to-left (outputs in natural storage
    order) — equivalent to flipping u/delta/B/C along L, scanning, and
    flipping y back, but with the flips folded into the kernel's index maps
    (zero extra HBM traffic). Used for VMamba cross-scan directions 2/3.

    interleaved=True: u/delta/B/C's L axis is pre-laid-out in the v2
    kernels' (S=128, T) lane order at IL_MEGA granularity (see IL_MEGA and
    ops/cross_scan.py interleave helpers) and y is RETURNED in that same
    order — the wrapper's four per-operand interleave shuffles and the
    output inverse vanish. Gate callers on interleaved_scan_ok()."""
    return _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                                  delta_softplus, chunk_size, reverse,
                                  interleaved)
