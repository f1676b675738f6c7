"""Pallas TPU wavefront kernel for the banded Viterbi fill.

TPU-native mapping of the DP specified in ops/dp_spec.py (the reference's C++
``nadavca.dtw`` hot loop — SURVEY.md §3.4; rebuilt, not translated):

  * **reads ride VPU sublanes** (R_TILE = 8 per kernel instance), **band slots
    ride lanes** (B = 128·m) — one DP step for 8 reads is a handful of vector
    ops on (8, B) tiles, no scalar code anywhere;
  * the band is **piecewise constant per signal chunk** (sched/bands.py), so
    the inner loop has *zero gathers*: expected-level band slices are
    pregathered per (read, chunk) and streamed in as dense blocks; the only
    realignment is one lane-gather per chunk boundary;
  * the grid is (read_tiles, chunks) with chunks innermost and the DP state
    (V, renorm accumulator, bit-pack register) carried in VMEM scratch across
    sequential chunk steps — the classic Pallas carried-wavefront pattern;
  * decisions are packed 1 bit/cell/step into int32 words and streamed to HBM
    (T·B/8 bytes per read), keeping the fill compute-bound; backtrack is a
    separate cheap pass over the bits;
  * per-chunk renormalization keeps carried f32 values O(chunk), preserving
    argmax decisions exactly (a per-read constant shift) while the absolute
    score accumulates in a separate f32 register.

The optional skip transition (advance by 2 positions — SURVEY.md §3.4
"possible skip transition V[t−1, i−2]") adds a third candidate to the max and
a SECOND decision bit-plane: adv ∈ {0, 1, 2} is encoded as (bit0 = adv == 1,
bit1 = adv == 2), each plane packed 32 steps/word exactly like the stay/move
bit. When cfg.use_skip is False the kernel compiles to the identical
single-plane program as before (the skip branch is static).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AlignConfig
from .banded_dp import NEG_INF, ViterbiResult

_HALF_LOG_2PI = 0.5 * float(np.log(2.0 * np.pi))


def _shift_lanes_left(v, amt_col, B: int, lane, fill):
    """v'[r, j] = v[r, j + amt[r]] for j + amt < B, else ``fill``.

    Per-read dynamic lane shift as a log-composition of static rolls
    (select on each bit of the shift amount). A per-row dynamic gather
    (``take_along_axis`` on the lane axis) lowers to ``tpu.dynamic_gather``,
    which Mosaic only implements when the row fits ONE 128-lane vreg — the
    B=256 adaptive-band configs failed to compile ("Multiple source vregs
    along gather dimension", caught by scripts/tpu_smoke.py tier 1). Rolls
    are exact at any band width; wrapped lanes are masked by the final
    ``j + amt < B`` select. Cost: ~2·log2(B) vector ops, once per chunk.
    """
    nbits = max(1, (B - 1).bit_length())
    for b in range(nbits):
        amt = 1 << b
        rolled = pltpu.roll(v, (B - amt) % B, axis=1)   # rolled[j] = v[j+amt]
        v = jnp.where((amt_col & amt) != 0, rolled, v)
    return jnp.where(lane + amt_col < B, v, fill)


def _shift_lanes_right(v, amt_col, B: int, lane, fill):
    """v'[r, j] = v[r, j - amt[r]] for j - amt >= 0, else ``fill``.

    Mirror of :func:`_shift_lanes_left` (same Mosaic rationale)."""
    nbits = max(1, (B - 1).bit_length())
    for b in range(nbits):
        amt = 1 << b
        rolled = pltpu.roll(v, amt, axis=1)             # rolled[j] = v[j-amt]
        v = jnp.where((amt_col & amt) != 0, rolled, v)
    return jnp.where(lane - amt_col >= 0, v, fill)


def _pair_fill_body(x_ref, dec_ref, v_scr, mu, em_const, inv2v,
                    neg_col, neg_col2, is_chunk0, tmask, *,
                    C: int, B: int, r_tile: int,
                    log_p_stay: float, log_p_move: float, unroll):
    """Two samples per iteration: half the serial dependency chain.

    The nested recurrence V(s+1)[j] = e2[j] + max(V(s)[j]+cs, V(s)[j-1]+cm)
    with V(s) = e1 + max(v+cs, v[-1]+cm) regroups by TOTAL advance a ∈
    {0,1,2} into  V(s+1) = e2 + max(v + K0, v[-1] + K1, v[-2] + K2)  where
    K0 = e1 + 2cs, K1 = max(e1, e1[-1]) + cs + cm, K2 = e1[-1] + 2cm are
    functions of the emissions alone — they compute OFF the carried-v
    critical chain, so the chain cost per pair (roll → add → max → max →
    add) is ~the cost one nested step paid per sample. The kernel was
    measured latency-bound, not issue-bound (BASELINE.md roofline:
    read_tile scaling), so extra off-chain ops buy wall time.

    Per-sample decision bits are recovered from the winning decomposition:
    a=1 splits by b_dec = (e1[-1] > e1) into (move-then-stay) vs
    (stay-then-move), matching the nested evaluation's tie order.
    """
    cs = log_p_stay
    cm = log_p_move
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_tile, B), 1)
    neg1f = jnp.full((r_tile, 1), NEG_INF, jnp.float32)

    def shift1(a, fill_col):
        return jnp.concatenate([fill_col, a[:, : B - 1]], axis=1)

    def shift2(a, fill_col2):
        return jnp.concatenate([fill_col2, a[:, : B - 2]], axis=1)

    def body(u, carry):
        v, pack = carry
        s = 2 * u
        x1 = x_ref[:, pl.ds(s, 1)]
        x2 = x_ref[:, pl.ds(s + 1, 1)]
        d1 = x1 - mu
        e1 = em_const - d1 * d1 * inv2v
        d2 = x2 - mu
        e2 = em_const - d2 * d2 * inv2v
        e1m = shift1(e1, neg1f)
        # pair-transition constants (independent of carried v)
        K0 = e1 + (cs + cs)
        b_dec = e1m > e1                       # a=1 decomposition: a2 = 1
        K1 = jnp.maximum(e1, e1m) + (cs + cm)
        K2 = e1m + (cm + cm)
        # the critical chain: two rolls (parallel), three adds (parallel),
        # two maxes, one add
        vm1 = shift1(v, neg_col)
        vm2 = shift2(v, neg_col2)
        c0 = v + K0
        c1 = vm1 + K1
        c2 = vm2 + K2
        a1best = c1 > c0
        m01 = jnp.maximum(c0, c1)
        a2best = c2 > m01
        v_pair = e2 + jnp.maximum(m01, c2)
        # per-sample advance bits from the winning total advance
        bit_hi = jnp.logical_or(a2best, jnp.logical_and(a1best, b_dec))
        bit_lo = jnp.logical_or(
            a2best, jnp.logical_and(a1best, jnp.logical_not(b_dec)))
        # chunk-0 start: V(0) = e1 (free start), V(1) = single step from it
        is_first = jnp.logical_and(is_chunk0, s == 0)
        stay_f = e1 + cs
        move_f = shift1(e1, neg1f) + cm
        bit_hi_first = move_f > stay_f
        v_first = e2 + jnp.maximum(stay_f, move_f)
        # half-pair (t_len ends between the two samples): single step from v
        stay_h = v + cs
        move_h = vm1 + cm
        bit_lo_half = move_h > stay_h
        v_half = e1 + jnp.maximum(stay_h, move_h)
        v_half = jnp.where(is_first, e1, v_half)
        bit_lo_half = jnp.logical_and(bit_lo_half,
                                      jnp.logical_not(is_first))

        act1 = s < tmask
        act2 = (s + 1) < tmask
        v_new = jnp.where(is_first, v_first, v_pair)
        # bool selects as logical ops (Mosaic rejects select_n on i1 vectors)
        not_first = jnp.logical_not(is_first)
        bit_hi = jnp.logical_or(
            jnp.logical_and(is_first, bit_hi_first),
            jnp.logical_and(not_first, bit_hi))
        bit_lo = jnp.logical_and(bit_lo, not_first)
        v = jnp.where(act2, v_new, jnp.where(act1, v_half, v))
        bit_lo = jnp.logical_or(
            jnp.logical_and(act2, bit_lo),
            jnp.logical_and(jnp.logical_not(act2),
                            jnp.logical_and(bit_lo_half, act1)))
        bit_hi = jnp.logical_and(bit_hi, act2)
        pack = pack | (bit_lo.astype(jnp.int32) << (s % 32))
        pack = pack | (bit_hi.astype(jnp.int32) << ((s + 1) % 32))

        @pl.when(s % 32 == 30)
        def _():
            dec_ref[pl.ds(s // 32, 1)] = pack.reshape(1, r_tile, B)

        pack = jnp.where(s % 32 == 30, jnp.zeros_like(pack), pack)
        return v, pack

    v, _ = jax.lax.fori_loop(
        0, C // 2, body,
        (v_scr[:], jnp.zeros((r_tile, B), jnp.int32)),
        unroll=unroll,
    )
    v_scr[:] = v


def _fill_kernel(
    # inputs
    x_ref,        # (R_TILE, C) f32 signal chunk
    mu_ref,       # (1, R_TILE, B) f32 band levels for this chunk
    sg_ref,       # (1, R_TILE, B) f32
    lo_ref,       # (1, R_TILE, 1) i32 band start of this chunk
    dl_ref,       # (1, R_TILE, 1) i32 band advance vs previous chunk
    tlen_ref,     # (R_TILE, 1) i32
    nref_ref,     # (R_TILE, 1) i32
    # outputs (dec2_ref present only when use_skip)
    # dec_ref     (C//32, R_TILE, B) i32 packed bit-plane 0 (adv == 1)
    # dec2_ref    (C//32, R_TILE, B) i32 packed bit-plane 1 (adv == 2)
    # vout_ref    (R_TILE, B) f32 final (renormalized) band values
    # accout_ref  (R_TILE, 1) f32 renormalization accumulator
    # scratch
    # v_scr       (R_TILE, B) f32 carried DP state
    # acc_scr     (R_TILE, 1) f32 carried renorm accumulator
    *refs,
    chunk_size: int,
    band_width: int,
    log_p_stay: float,
    log_p_move: float,
    log_p_skip: float,
    use_skip: bool,
    r_tile: int,
    unroll,
    pair_step: bool = False,
):
    if use_skip:
        dec_ref, dec2_ref, vout_ref, accout_ref, v_scr, acc_scr = refs
    else:
        dec_ref, vout_ref, accout_ref, v_scr, acc_scr = refs
        dec2_ref = None
    R_TILE = r_tile
    c = pl.program_id(1)
    C, B = chunk_size, band_width

    mu = mu_ref[0]
    sg = sg_ref[0]
    lo_col = lo_ref[0]
    dl_col = dl_ref[0]
    tlen = tlen_ref[:]
    nref = nref_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (R_TILE, B), 1)
    pos_valid = (lo_col + lane) < nref
    em_const = jnp.where(pos_valid, -jnp.log(sg) - _HALF_LOG_2PI, NEG_INF)
    inv2v = 0.5 / (sg * sg)
    # polynomial emission constants: e(x) = (C2·x + C1)·x + C0s is two fused
    # ops per step vs four for em_const − (x−μ)²·inv2v, and the stay
    # transition folds into C0s (the free-start cell un-folds it explicitly
    # in the masked body). The kernel is issue-bound (BASELINE.md 2026-08-21
    # ablation), so fewer per-step ops is wall time. The scan backend mirrors
    # this exact expression (ops/banded_dp.py) so backends stay bit-identical.
    c2p = -inv2v
    c1p = (mu + mu) * inv2v
    c0p = em_const - mu * mu * inv2v + log_p_stay

    @pl.when(c == 0)
    def _():
        v_scr[:] = jnp.full((R_TILE, B), NEG_INF, jnp.float32)
        acc_scr[:] = jnp.zeros((R_TILE, 1), jnp.float32)

    @pl.when(c > 0)
    def _():
        # realign carried state to the new band start: V'[j] = V[j + delta]
        v_scr[:] = _shift_lanes_left(v_scr[:], dl_col, B, lane, NEG_INF)

    t0 = c * C
    neg_col = jnp.full((R_TILE, 1), NEG_INF, jnp.float32)
    neg_col2 = jnp.full((R_TILE, 2), NEG_INF, jnp.float32)
    is_chunk0 = c == 0
    tmask = tlen - t0  # (R_TILE, 1): in-chunk sample s is active iff s < tmask

    def finish(v):
        # chunk-end renormalization: per-read constants into the accumulator
        m = jnp.max(v, axis=1, keepdims=True)
        m = jnp.where(m > NEG_INF / 2, m, 0.0)
        v_scr[:] = v - m
        acc = acc_scr[:] + m
        acc_scr[:] = acc
        vout_ref[:] = v - m
        accout_ref[:] = acc

    if pair_step and not use_skip:
        _pair_fill_body(x_ref, dec_ref, v_scr, mu, em_const, inv2v,
                        neg_col, neg_col2, is_chunk0, tmask,
                        C=C, B=B, r_tile=R_TILE,
                        log_p_stay=log_p_stay, log_p_move=log_p_move,
                        unroll=unroll)
        finish(v_scr[:])
        return

    # One fori_loop over the chunk, fully unrolled by Mosaic; DP state and the
    # bit-pack register(s) ride the loop carry (vregs), decisions flush to the
    # output block every 32 steps. ``masked`` compiles the boundary variant
    # (first-sample free start, per-read t_len masking); interior fully-
    # active chunks run the stripped body below — removing identity selects
    # is exact and saves ~25% of the per-step vector ops (the kernel is
    # issue-bound at production tile sizes, BASELINE.md 2026-08-21 ablation).
    dcs = log_p_move - log_p_stay

    def body(s, carry, masked=True):
        v, pack, pack2 = carry
        x_col = x_ref[:, pl.ds(s, 1)]
        if use_skip:
            diff = x_col - mu
            emit = em_const - diff * diff * inv2v
            stay = v + log_p_stay
            move = jnp.concatenate([neg_col, v[:, : B - 1]], axis=1) + log_p_move
            bit = move > stay
            best = jnp.maximum(stay, move)
            # third candidate: advance by 2 (strict > keeps the spec's
            # first-max tie rule: stay beats move beats skip)
            skip = jnp.concatenate([neg_col2, v[:, : B - 2]], axis=1) + log_p_skip
            bit2 = skip > best
            bit = jnp.logical_and(bit, jnp.logical_not(bit2))
            best = jnp.maximum(best, skip)
        else:
            # poly emission (stay folded into c0p) + transition-delta compare
            emit = (c2p * x_col + c1p) * x_col + c0p
            mv = jnp.concatenate([neg_col, v[:, : B - 1]], axis=1) + dcs
            bit = mv > v
            best = jnp.maximum(v, mv)
        if masked:
            free = emit if use_skip else emit - log_p_stay
            is_first = jnp.logical_and(is_chunk0, s == 0)
            v_new = jnp.where(is_first, free, emit + best)
            bit = jnp.logical_and(bit, jnp.logical_not(is_first))
            active = s < tmask  # (R_TILE, 1)
            v = jnp.where(active, v_new, v)
            bit = jnp.logical_and(bit, active)
        else:
            v = emit + best
        pack = pack | (bit.astype(jnp.int32) << (s % 32))
        if use_skip:
            if masked:
                bit2 = jnp.logical_and(bit2, jnp.logical_not(is_first))
                bit2 = jnp.logical_and(bit2, active)
            pack2 = pack2 | (bit2.astype(jnp.int32) << (s % 32))

        @pl.when(s % 32 == 31)
        def _():
            dec_ref[pl.ds(s // 32, 1)] = pack.reshape(1, R_TILE, B)
            if use_skip:
                dec2_ref[pl.ds(s // 32, 1)] = pack2.reshape(1, R_TILE, B)

        pack = jnp.where(s % 32 == 31, jnp.zeros_like(pack), pack)
        if use_skip:
            pack2 = jnp.where(s % 32 == 31, jnp.zeros_like(pack2), pack2)
        return v, pack, pack2

    init = (v_scr[:], jnp.zeros((R_TILE, B), jnp.int32),
            jnp.zeros((R_TILE, B), jnp.int32))
    # interior chunk: every read fully active and not the free-start chunk
    interior = jnp.logical_and(c > 0, jnp.min(tmask) >= C)

    @pl.when(interior)
    def _():
        v, _, _ = jax.lax.fori_loop(
            0, C, functools.partial(body, masked=False), init, unroll=unroll)
        finish(v)

    @pl.when(jnp.logical_not(interior))
    def _():
        v, _, _ = jax.lax.fori_loop(0, C, body, init, unroll=unroll)
        finish(v)


def viterbi_fill_pallas(
    x: jax.Array,          # (R, T) f32
    t_len: jax.Array,      # (R,) i32
    mu_band: jax.Array,    # (n_chunks, R, B) f32 — chunk-major for TPU block tiling
    sigma_band: jax.Array, # (n_chunks, R, B) f32
    lo: jax.Array,         # (n_chunks, R, 1) i32
    delta: jax.Array,      # (n_chunks, R, 1) i32
    n_ref: jax.Array,      # (R,) i32
    cfg: AlignConfig,
    interpret: bool = False,
):
    """Run the fill kernel.

    Returns (decs, V (R, B), acc (R,)) where decs is a tuple of packed
    decision bit-planes: (plane0,) without skip, (plane0, plane1) with skip —
    each (T//32, R, B) i32.
    """
    R, T = x.shape
    B = cfg.band_width
    C = cfg.signal_chunk
    assert R % cfg.read_tile == 0, f"batch must be a multiple of {cfg.read_tile} reads"
    assert T % C == 0 and C % 32 == 0
    n_chunks = T // C
    assert mu_band.shape == (n_chunks, R, B)

    R_TILE = cfg.read_tile
    kernel = functools.partial(
        _fill_kernel,
        chunk_size=C,
        band_width=B,
        log_p_stay=cfg.log_p_stay,
        log_p_move=cfg.log_p_move,
        log_p_skip=cfg.log_p_skip,
        use_skip=cfg.use_skip,
        r_tile=R_TILE,
        unroll=cfg.kernel_unroll,
        pair_step=getattr(cfg, "dp_pair_step", False),
    )
    grid = (R // R_TILE, n_chunks)
    n_planes = 2 if cfg.use_skip else 1
    dec_spec = pl.BlockSpec((C // 32, R_TILE, B), lambda r, c: (c, r, 0),
                            memory_space=pltpu.VMEM)
    dec_shape = jax.ShapeDtypeStruct((T // 32, R, B), jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R_TILE, C), lambda r, c: (r, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE, B), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE, B), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE, 1), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE, 1), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 1), lambda r, c: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 1), lambda r, c: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[dec_spec] * n_planes + [
            pl.BlockSpec((R_TILE, B), lambda r, c: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 1), lambda r, c: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[dec_shape] * n_planes + [
            jax.ShapeDtypeStruct((R, B), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R_TILE, B), jnp.float32),
            pltpu.VMEM((R_TILE, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(12 + 3 * (n_planes - 1)) * R * T * B,
            bytes_accessed=int(x.size * 4 + mu_band.size * 8
                               + n_planes * (T // 32) * R * B * 4),
            transcendentals=R * n_chunks * B,
        ),
        interpret=interpret,
    )(
        x,
        mu_band,
        sigma_band,
        lo,
        delta,
        t_len.reshape(R, 1).astype(jnp.int32),
        n_ref.reshape(R, 1).astype(jnp.int32),
    )
    decs = tuple(outs[:n_planes])
    v_fin, acc_fin = outs[n_planes], outs[n_planes + 1]
    return decs, v_fin, acc_fin[:, 0]


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def backtrack_from_bits(
    decs,               # tuple of (T//32, R, B) i32 packed decision planes
    lo: jax.Array,      # (R, n_chunks) i32
    delta: jax.Array,   # (R, n_chunks) i32
    j_end: jax.Array,   # (R,) i32
    chunk_size: int,
) -> jax.Array:
    """Recover per-sample reference positions from packed decision bits.

    A reverse lax.scan with one (R,)-gather per step; padding steps are
    identity because their bits are 0 (stay) and their band never moves.
    decs is the bit-plane tuple from viterbi_fill_pallas: adv = plane0 +
    2·plane1 (plane1 only present under cfg.use_skip). Returns path (R, T)
    int32.
    """
    dec0 = decs[0]
    dec1 = decs[1] if len(decs) > 1 else None
    Tw, R, B = dec0.shape
    T = Tw * 32
    C = chunk_size
    assert C % 32 == 0
    lane = jnp.arange(B, dtype=jnp.int32)[None, :]  # (1, B)

    # Word-outer structure: one (R, B) decision slab is loaded from HBM per 32
    # steps and the 32 bit-extractions run on the register-resident slab.
    # Bit extraction is compare + masked reduce — a one-hot lane mask rebuilt
    # from the integer pointer stays entirely on the VPU (per-row
    # take_along_axis gathers are serialized row-wise on TPU and were ~100x
    # slower; per-step slab loads cost another ~10x).
    def word_step(j, w):
        # w runs Tw-1 .. 0; within the word, bits t = 32w+31 .. 32w (but the
        # t = T-1 transition is consumed by the caller's argmax, so the first
        # processed t is T-2... handled by masking below)
        word = jax.lax.dynamic_index_in_dim(dec0, w, axis=0, keepdims=False)
        word1 = (jax.lax.dynamic_index_in_dim(dec1, w, axis=0, keepdims=False)
                 if dec1 is not None else None)
        dcol = jax.lax.dynamic_index_in_dim(delta.T, w * 32 // C, axis=0,
                                            keepdims=False)  # (R,) delta of this chunk
        positions = []

        def bit_step(j, s):
            t = w * 32 + s
            onehot = lane == j[:, None]
            bits = (word >> s) & 1
            if word1 is not None:
                bits = bits + 2 * ((word1 >> s) & 1)
            adv = jnp.sum(jnp.where(onehot, bits, 0), axis=1)
            d = jnp.where((t % C) == 0, dcol, 0)
            j_prev = j + d - adv
            lo_prev = jax.lax.dynamic_index_in_dim(
                lo.T, (t - 1) // C, axis=0, keepdims=False
            )
            return j_prev.astype(jnp.int32), (lo_prev + j_prev).astype(jnp.int32)

        for s in range(31, -1, -1):
            j, pos = bit_step(j, s)
            positions.append(pos)
        return j, jnp.stack(positions)  # (32, R): positions at t-1 for t=32w+31..32w

    j_end = j_end.astype(jnp.int32)
    # process words from the top; within the scan, word Tw-1 first
    js, pos_words = jax.lax.scan(word_step, j_end, jnp.arange(Tw - 1, -1, -1))
    # pos_words: (Tw_scan, 32, R); scan i processes word w = Tw-1-i with inner
    # entries at t = 32w+31 .. 32w, each holding the position at time t-1.
    pos_flat = pos_words.reshape(Tw * 32, R)   # descending t = T-1 .. 0
    pos_flat = jnp.flip(pos_flat, axis=0).T    # (R, T): column q ↔ iteration t=q
    # column q holds the position at time q-1 ⇒ path[0..T-2] = columns 1..T-1;
    # column 0 came from the bogus t=0 iteration (no predecessor) — dropped.
    lo_last = lo[:, -1]
    pos_last = (lo_last + j_end)[:, None]
    path = jnp.concatenate([pos_flat[:, 1:T], pos_last], axis=1)
    return path


def _band_gather_kernel(lo_ref, mu_ref, sg_ref, mub_ref, sgb_ref, *,
                        n_chunks: int, band_width: int, rt: int, npb: int):
    """Per (read, chunk) band slice mu[r, lo[r,c] : lo+B] on device.

    The host numpy pregather measured 0.17–0.33 s/batch at CLI shapes on the
    2-CPU host and its (n_chunks, R, B) result is ~23 MB of H2D per batch —
    both vanish by slicing on device. Per-read offsets are arbitrary, so:
    coarse 128-blocks via dynamic LEADING-dim indexing of the (rt, Np/128,
    1, 128) block, fine residual via a dynamic roll + lane select (the same
    two-level pattern as the shear/table kernels).
    """
    r = pl.program_id(0)
    B = band_width
    nb = B // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def chunk_body(c, _):
        for rr in range(rt):
            lo_v = lo_ref[c, r * rt + rr]
            q0 = lo_v // 128
            ro = lo_v % 128
            blocks_mu = [mu_ref[rr, pl.ds(q0 + i, 1), 0, :]
                         for i in range(nb + 1)]
            blocks_sg = [sg_ref[rr, pl.ds(q0 + i, 1), 0, :]
                         for i in range(nb + 1)]
            for j in range(nb):
                sel = lane < 128 - ro
                mub_ref[pl.ds(c, 1), rr, j * 128 : (j + 1) * 128] = jnp.where(
                    sel, pltpu.roll(blocks_mu[j], 128 - ro, axis=1),
                    pltpu.roll(blocks_mu[j + 1], 128 - ro, axis=1))
                sgb_ref[pl.ds(c, 1), rr, j * 128 : (j + 1) * 128] = jnp.where(
                    sel, pltpu.roll(blocks_sg[j], 128 - ro, axis=1),
                    pltpu.roll(blocks_sg[j + 1], 128 - ro, axis=1))
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def band_gather_pallas(mu, sigma, lo, band_width: int, rt: int = 8,
                       interpret: bool = False):
    """(n_chunks, R, B) chunk-major band levels, sliced on device.

    Same contract as sched.gather_band_levels + transpose: out[c, r, :] =
    mu[r, lo[r, c] : lo[r, c] + B], positions beyond N reading the pad
    values (mu 0, sigma 1). lo must satisfy 0 <= lo <= max(N - B, 0)
    (build_chunked_bands guarantees this).
    """
    R, N = mu.shape
    n_chunks = lo.shape[1]
    B = band_width
    # pad the read axis up to the tile (per-device shard_map shards can be
    # smaller than rt) and the position axis so the coarse blocks
    # q0 .. q0 + B/128 always exist
    Rp = -(-R // rt) * rt
    Np = -(-N // 128) * 128 + 128
    mu_p = jnp.pad(mu, ((0, Rp - R), (0, Np - N))
                   ).reshape(Rp, Np // 128, 1, 128)
    sg_p = jnp.pad(sigma, ((0, Rp - R), (0, Np - N)),
                   constant_values=1.0).reshape(Rp, Np // 128, 1, 128)
    lo_sp = jnp.pad(lo, ((0, Rp - R), (0, 0))).T.astype(jnp.int32)
    kernel = functools.partial(
        _band_gather_kernel, n_chunks=n_chunks, band_width=B, rt=rt,
        npb=Np // 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // rt,),
        in_specs=[
            pl.BlockSpec((rt, Np // 128, 1, 128), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, Np // 128, 1, 128), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_chunks, rt, B), lambda r, *_: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks, rt, B), lambda r, *_: (0, r, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_chunks, Rp, B), jnp.float32)] * 2,
        interpret=interpret,
    )(lo_sp, mu_p.astype(jnp.float32), sg_p.astype(jnp.float32))
    if Rp != R:
        out = (out[0][:, :R], out[1][:, :R])
    return out


def gather_band_levels_jax(mu, sigma, lo, band_width):
    """Device-side band-slice pregather (jittable version of sched.gather_band_levels)."""
    R, N = mu.shape
    n_chunks = lo.shape[1]
    B = band_width
    idx = lo[:, :, None] + jnp.arange(B, dtype=jnp.int32)[None, None, :]
    idx2 = idx.reshape(R, n_chunks * B)
    ok = idx2 < N
    safe = jnp.minimum(idx2, N - 1)
    mu_b = jnp.where(ok, jnp.take_along_axis(mu, safe, axis=1), 0.0)
    sg_b = jnp.where(ok, jnp.take_along_axis(sigma, safe, axis=1), 1.0)
    # chunk-major layout for the kernel's (1, R_TILE, B) blocks
    return (
        mu_b.reshape(R, n_chunks, B).transpose(1, 0, 2).astype(jnp.float32),
        sg_b.reshape(R, n_chunks, B).transpose(1, 0, 2).astype(jnp.float32),
    )


def pallas_viterbi_batch(
    x, t_len, mu, sigma, n_ref, lo, delta, cfg: AlignConfig,
    interpret: bool = False, with_path: bool = True,
    mu_band=None, sg_band=None,
):
    """High-level jittable wrapper: pregather → fill kernel → score (→ path).

    Same contract as banded_dp.banded_viterbi_batch but taking chunked bands
    (lo/delta per chunk, from sched.build_chunked_bands). Pass chunk-major
    (n_chunks, R, B) mu_band/sg_band to skip the on-device pregather (XLA
    batched gathers are slow on TPU — host pregather via
    sched.gather_band_levels is ~free and overlaps with device compute).
    """
    R, T = x.shape
    B = cfg.band_width
    if mu_band is None:
        mu_band, sg_band = band_gather_pallas(mu, sigma, lo, B,
                                              interpret=interpret)
    n_chunks = lo.shape[1]
    lo_cm = lo.T.reshape(n_chunks, R, 1).astype(jnp.int32)
    dl_cm = delta.T.reshape(n_chunks, R, 1).astype(jnp.int32)
    decs, v_fin, acc = viterbi_fill_pallas(
        x, t_len, mu_band, sg_band, lo_cm, dl_cm, n_ref, cfg, interpret=interpret
    )
    lane = jnp.arange(B, dtype=jnp.int32)[None, :]
    i_fin = lo[:, -1][:, None] + lane
    v_valid = jnp.where(i_fin < n_ref[:, None], v_fin, NEG_INF)
    j_end = jnp.argmax(v_valid, axis=1).astype(jnp.int32)
    score = acc + jnp.take_along_axis(v_valid, j_end[:, None], axis=1)[:, 0]
    if not with_path:
        return ViterbiResult(score=score, path=None, final_j=j_end), decs
    path = backtrack_pallas(decs, lo, delta, j_end, cfg.signal_chunk,
                            interpret=interpret)
    return ViterbiResult(score=score, path=path, final_j=j_end), decs


# --------------------------------------------------------------------------
# Pallas backtrack, one-hot walk: the pointer is carried as a one-hot (R, B)
# plane and updated branchlessly (mask + lane shift), so the per-step work is
# a handful of same-layout vector ops — no cross-lane reductions and no
# (R,)↔(R, B) relayouts inside the bit loop (the previous kernel paid both
# per step; 17.7 ms → ~4 ms at bench shapes). The kernel emits one packed
# advance-bit word per (read, word, plane); the position sequence is then a
# reverse cumsum in XLA: j[t-1] = j[t] + delta[t] − adv[t], path = lo + j.
# With skip (two decision planes) the walk shifts the one-hot by 1 or 2 lanes
# and emits a second packed word so adv ∈ {0, 1, 2} is recoverable.
# --------------------------------------------------------------------------

def _advbits_kernel(
    # inputs: dec_ref (C/32, R, B) decision plane0 words of ONE CHUNK
    #   (chunk index n_chunks-1-g — one grid step per chunk, not per word:
    #   at per-word granularity the ~13 us/step grid overhead dominated);
    #   [dec2_ref (C/32, R, B) plane1 when use_skip;] dl_ref (1, R, 1) band
    #   delta of this chunk; jend_ref (R, 1) argmax band slot (read at g==0)
    # outputs: adv_ref (C/32, R, 1) packed adv bit0 per word
    #   [adv2_ref (C/32, R, 1) packed adv bit1 when use_skip]
    # scratch: p_scr (R, B) carried one-hot pointer plane
    *refs,
    n_words: int,
    chunk_size: int,
    band_width: int,
    r: int,
    use_skip: bool,
):
    if use_skip:
        dec_ref, dec2_ref, dl_ref, jend_ref, adv_ref, adv2_ref, p_scr = refs
    else:
        dec_ref, dl_ref, jend_ref, adv_ref, p_scr = refs
        dec2_ref = adv2_ref = None
    g = pl.program_id(0)
    B = band_width
    wpc = chunk_size // 32                  # words per chunk
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, B), 1)

    @pl.when(g == 0)
    def _():
        p_scr[:] = (lane == jend_ref[:]).astype(jnp.int32)

    zero_col = jnp.zeros((r, 1), jnp.int32)
    zero_col2 = jnp.zeros((r, 2), jnp.int32)
    p = p_scr[:]
    for wi in range(wpc - 1, -1, -1):       # words of the chunk, descending
        word = dec_ref[wi]                  # (R, B)
        word2 = dec2_ref[wi] if use_skip else None

        def body(i, carry, word=word, word2=word2):
            p, pack, pack2 = carry
            s = 31 - i                      # walk t = 32w+31 .. 32w
            moved = p & ((word >> s) & 1)   # one-hot at the pointer, iff move
            if use_skip:
                skipped = p & ((word2 >> s) & 1)
                p = (p - moved - skipped
                     + jnp.concatenate([moved[:, 1:], zero_col], axis=1)
                     + jnp.concatenate([skipped[:, 2:], zero_col2], axis=1))
                pack2 = pack2 | (skipped << s)
            else:
                p = p - moved + jnp.concatenate([moved[:, 1:], zero_col],
                                                axis=1)
            # distinct steps set distinct bit positions, so the lane-sum at
            # the end of the word reassembles the packed adv bits without
            # collisions
            pack = pack | (moved << s)
            return p, pack, pack2

        p, pack, pack2 = jax.lax.fori_loop(
            0, 32, body,
            (p, jnp.zeros((r, B), jnp.int32), jnp.zeros((r, B), jnp.int32)),
            unroll=True,
        )
        adv_ref[wi] = jnp.sum(pack, axis=1, keepdims=True)
        if use_skip:
            adv2_ref[wi] = jnp.sum(pack2, axis=1, keepdims=True)

    # crossing into the previous chunk: slot j here is slot j + delta there
    d_col = dl_ref[0]
    p_scr[:] = _shift_lanes_right(p, d_col, B, lane, 0)


def backtrack_pallas(decs, lo, delta, j_end, chunk_size: int,
                     interpret: bool = False):
    """Pallas replacement for backtrack_from_bits. Same contract (decs is the
    bit-plane tuple from viterbi_fill_pallas)."""
    use_skip = len(decs) > 1
    Tw, R, B = decs[0].shape
    T = Tw * 32
    C = chunk_size
    n_chunks = lo.shape[1]
    assert C % 32 == 0 and Tw % (C // 32) == 0
    wpc = C // 32
    kernel = functools.partial(
        _advbits_kernel, n_words=Tw, chunk_size=C, band_width=B, r=R,
        use_skip=use_skip,
    )
    dl_cm = delta.T[:, :, None].astype(jnp.int32)

    dec_spec = pl.BlockSpec((wpc, R, B), lambda g: (n_chunks - 1 - g, 0, 0),
                            memory_space=pltpu.VMEM)
    adv_spec = pl.BlockSpec((wpc, R, 1), lambda g: (n_chunks - 1 - g, 0, 0),
                            memory_space=pltpu.VMEM)
    adv_shape = jax.ShapeDtypeStruct((Tw, R, 1), jnp.int32)
    n_planes = 2 if use_skip else 1
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[dec_spec] * n_planes + [
            pl.BlockSpec((1, R, 1), lambda g: (n_chunks - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[adv_spec] * n_planes,
        out_shape=[adv_shape] * n_planes,
        scratch_shapes=[pltpu.VMEM((R, B), jnp.int32)],
        interpret=interpret,
    )(*decs, dl_cm, j_end.reshape(R, 1).astype(jnp.int32))
    advw = out[0]

    # j[t-1] = j[t] + d[t] − adv[t] with d[t] = delta[t // C] iff t % C == 0,
    # so j at time t is j_end plus the suffix sum of (d − adv) over u > t.
    shifts = jnp.arange(32, dtype=jnp.int32)
    adv = ((advw[:, None, :, 0] >> shifts[None, :, None]) & 1)   # (Tw, 32, R)
    if use_skip:
        adv = adv + 2 * ((out[1][:, None, :, 0] >> shifts[None, :, None]) & 1)
    adv = adv.reshape(T, R).T.astype(jnp.int32)                  # (R, T)
    d_full = jnp.concatenate(
        [delta[:, :, None].astype(jnp.int32),
         jnp.zeros((R, n_chunks, C - 1), jnp.int32)], axis=2
    ).reshape(R, T)
    rc = jnp.cumsum((d_full - adv)[:, ::-1], axis=1)[:, ::-1]    # Σ_{u≥t}
    suffix = jnp.concatenate([rc[:, 1:], jnp.zeros((R, 1), jnp.int32)], axis=1)
    lo_rep = jnp.repeat(lo.astype(jnp.int32), C, axis=1)
    return lo_rep + j_end[:, None].astype(jnp.int32) + suffix
