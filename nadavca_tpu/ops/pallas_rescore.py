"""Pallas TPU kernel for the restricted local re-DP (SNP rescoring).

Same algorithm as ops/banded_dp.base_loglik_local_batch (itself the batched
form of dp_spec.base_substitution_loglik_local — the reference's second hot
loop, SURVEY.md §3.2), rebuilt as a tile kernel: the XLA lax.scan version
re-reads its (R, L, k, 4) state and constants from HBM on every one of t_w
steps (~10 GB/batch, measured ~1.9 s); here the whole per-tile DP state — k·4
(RT, LT) planes — lives in vector registers across the t-loop, so HBM traffic
is just the inputs once (docs/rescore_kernel_design.md).

Layout: positions ride lanes (LT = 128), reads ride sublanes (RT = 8), the
(window-slot j × base b) axes are unrolled as leading dims of small tiles;
the j-shift of the DP is static reindexing — free, unlike the fill kernel's
lane shift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AlignConfig
from .banded_dp import NEG_INF

_HALF_LOG_2PI = 0.5 * float(np.log(2.0 * np.pi))
RT = 8    # reads per tile (sublanes)
LT = 128  # positions per tile (lanes)


def _count_kernel(tlen_ref, p_ref, out_ref, *, np_lanes, chunk, r_tile, w_t):
    """Per chunk: one dense compare window at floor128(min), cheap whole-row
    adds right of it, and a rare full-width fallback.

    The path is monotone per read, so a chunk's LIVE values span a narrow
    window (~chunk/dwell positions). The previous per-lane-tile version
    branched 2x per 128-lane tile per step (pl.when overhead dominated:
    ~10 us/step) and, worse, a single padded sample drove the block max to
    the sentinel so every mixed chunk ran the dense compare over most lane
    tiles. Sentinel-aware stats fix both: lanes above the live max add the
    per-read LIVE sample count (a prefix of the chunk, from t_len), not the
    chunk length.
    """
    c = pl.program_id(1)
    blk = p_ref[:]                                   # (rt, chunk)
    m0 = jnp.min(blk)
    live = blk < np_lanes
    m1r = jnp.max(jnp.where(live, blk, -1))          # max over LIVE samples

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros((r_tile, np_lanes), jnp.int32)

    n_live = jnp.clip(tlen_ref[:] - c * chunk, 0, chunk)       # (rt, 1)
    iota_full = jax.lax.broadcasted_iota(jnp.int32, (r_tile, np_lanes), 1)
    lt0 = jnp.clip((m0 // 128) * 128, 0, np_lanes - w_t)
    lt0 = pl.multiple_of(lt0, 128)
    above = iota_full >= lt0 + w_t
    # lanes right of the dense window and above every live value count all
    # live samples of this chunk (live samples are a prefix: t_len-derived)
    out_ref[:] = out_ref[:] + jnp.where(above & (iota_full > m1r),
                                        n_live, 0)

    # dense window [lt0, lt0 + w_t): per-sample compares; static unroll so
    # every lane index stays static (Mosaic rejects dynamic lane indices —
    # the round-2 regression, VERDICT.md weakness #1)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (r_tile, w_t), 1) + lt0
    acc = jnp.zeros((r_tile, w_t), jnp.int32)
    for s in range(chunk):
        acc = acc + (blk[:, s : s + 1] < iota_t).astype(jnp.int32)
    out_ref[:, pl.ds(lt0, w_t)] = out_ref[:, pl.ds(lt0, w_t)] + acc

    # rare fallback: the chunk's live span outran the dense window (a jump
    # > w_t - 127 positions within one chunk)
    @pl.when(m1r >= lt0 + w_t)
    def _():
        acc2 = jnp.zeros((r_tile, np_lanes), jnp.int32)
        for s in range(chunk):
            acc2 = acc2 + (blk[:, s : s + 1] < iota_full).astype(jnp.int32)
        out_ref[:] = out_ref[:] + jnp.where(above & (iota_full <= m1r),
                                            acc2, 0)


def path_counts_pallas(path_safe, n_lanes: int, t_len=None, rt: int = 64,
                       chunk: int = 256, w_t: int = 256,
                       interpret: bool = False):
    """C[r, i] = #{t : path_safe[r, t] < i} for i in [0, n_lanes).

    For a monotone nondecreasing path this is searchsorted-left as a dense
    counting reduction — the XLA alternative (segment_min scatter over R·T
    elements) measured 86 ms at bench shapes vs ~3 ms here. Masked samples
    must be pre-set to >= n_lanes so they never count; t_len (R,) gives the
    per-read live-sample count (live samples must be a prefix). t_len=None
    means every sample below the sentinel is live (t_len = T).
    """
    R, T = path_safe.shape
    assert n_lanes % 128 == 0 and w_t % 128 == 0 and n_lanes >= w_t
    Rp = -(-R // rt) * rt
    Tp = -(-T // chunk) * chunk
    if t_len is None:
        t_len = jnp.full((R,), T, jnp.int32)
    if Rp != R or Tp != T:
        # padded samples carry the sentinel (never < any lane index)
        path_safe = jnp.pad(path_safe, ((0, Rp - R), (0, Tp - T)),
                            constant_values=n_lanes)
        t_len = jnp.pad(t_len, (0, Rp - R))
    kernel = functools.partial(
        _count_kernel, np_lanes=n_lanes, chunk=chunk, r_tile=rt, w_t=w_t
    )
    out = pl.pallas_call(
        kernel,
        grid=(Rp // rt, Tp // chunk),
        in_specs=[
            pl.BlockSpec((rt, 1), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, chunk), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, n_lanes), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, n_lanes), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * Tp * w_t,
            bytes_accessed=int(Rp * Tp * 4 + Rp * n_lanes * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(t_len.reshape(Rp, 1).astype(jnp.int32), path_safe.astype(jnp.int32))
    return out[:R]


def _rescore_dp_body(xs_ref, em, mu, iv, w_ref, kk_ref, cod_ref, out_ref, wm,
                     *, k, t_w, log_p_stay, log_p_move, rt=RT,
                     unroll2=False):
    """Shared local-DP body: em/mu/iv are (k, 4, rt, LT) VALUES."""
    w = w_ref[:]

    x0 = xs_ref[0]                                   # (rt, LT)
    d0 = x0[None, None] - mu
    emit0 = em - d0 * d0 * iv
    init_mask = jax.lax.broadcasted_iota(jnp.int32, (k, 4, rt, LT), 0) == 0
    v0 = jnp.where(init_mask, emit0, NEG_INF)

    neg_row = jnp.full((1, 4, rt, LT), NEG_INF, jnp.float32)

    def one_step(s, v):
        # clamp the load (an unrolled trailing step can touch s == t_w);
        # the active mask makes any s >= w step an exact identity
        x = xs_ref[pl.ds(jnp.minimum(s, t_w - 1), 1)][0]     # (rt, LT)
        d = x[None, None] - mu
        emit = em - d * d * iv
        stay = v + log_p_stay
        move = jnp.concatenate([neg_row, v[: k - 1]], axis=0) + log_p_move
        v_new = emit + jnp.maximum(stay, move)
        active = (s < w)[None, None]                 # (1, 1, rt, LT)
        return jnp.where(active, v_new, v)

    # dynamic trip count: steps s >= max(W) of this tile are identity for
    # every lane (the active mask), so stopping at the tile's own max is
    # exact. Typical windows are ~k·dwell ≈ 60 samples vs the static
    # t_w = 192 bound — most tiles run 2–3× fewer steps.
    n_live = jnp.minimum(wm, t_w) - 1                # steps s = 1..wm-1
    if unroll2:
        # two DP samples per trip — identical op sequence per sample (the
        # masked trailing step is an exact identity), halves loop overhead
        def body2(i, v):
            s = 1 + 2 * i
            return one_step(s + 1, one_step(s, v))

        v = jax.lax.fori_loop(0, (n_live + 1) // 2, body2, v0)
    else:
        v = jax.lax.fori_loop(1, n_live + 1, lambda s, v: one_step(s, v), v0)

    kk1 = kk_ref[:] - 1                               # (rt, LT)
    out = jnp.zeros((4, rt, LT), jnp.float32)
    for j in range(k):
        out = out + jnp.where((kk1 == j)[None], v[j], 0.0)
    # subtract the reference base's score in-kernel (an XLA take_along_axis
    # over (R, L) lowers to a serialized per-element gather)
    cod = cod_ref[:]
    ref = jnp.zeros((rt, LT), jnp.float32)
    for b in range(4):
        ref = ref + jnp.where(cod == b, out[b], 0.0)
    out_ref[:] = out - ref[None]


def _rescore_kernel(
    wm_ref,    # (R//rt, L//LT) i32 scalar-prefetch: max live W per tile
    xs_ref,    # (t_w, rt, LT) f32: sample s of each position's window
    em_ref,    # (k*4, rt, LT) f32: -log sigma' - c, NEG_INF at dead (j, b)
    mu_ref,    # (k*4, rt, LT) f32: substituted level means
    iv_ref,    # (k*4, rt, LT) f32: 0.5 / sigma'^2
    w_ref,     # (rt, LT) i32: live window length per position
    kk_ref,    # (rt, LT) i32: number of live window slots (<= k)
    cod_ref,   # (rt, LT) i32: reference base per position (4 = pad)
    out_ref,   # (4, rt, LT) f32: DP scores per base MINUS the ref base's
    *,
    k: int,
    t_w: int,
    log_p_stay: float,
    log_p_move: float,
    rt: int,
    unroll2: bool,
):
    wm = wm_ref[pl.program_id(0), pl.program_id(1)]
    _rescore_dp_body(
        xs_ref, em_ref[:].reshape(k, 4, rt, LT),
        mu_ref[:].reshape(k, 4, rt, LT), iv_ref[:].reshape(k, 4, rt, LT),
        w_ref, kk_ref, cod_ref, out_ref, wm,
        k=k, t_w=t_w, log_p_stay=log_p_stay, log_p_move=log_p_move,
        rt=rt, unroll2=unroll2)


def _rescore_tab_kernel(
    wm_ref,    # (R//rt, L//LT) i32 scalar-prefetch
    woff_ref,  # (R,) i32 scalar-prefetch: table column offset per read
    xs_ref,    # (t_w, rt, LT) f32
    tab_ref,   # (3, k*4, rowsP//128, 1, 128) f32 in ANY memory (HBM): the
               # stacked [em, mu, iv] genome tables (SubstTables.tab4)
    w_ref, kk_ref, cod_ref,      # (rt, LT) i32
    out_ref,   # (4, rt, LT) f32
    tscr,      # (3, k*4, rt, 2, 128) f32 VMEM scratch: two coarse blocks/read
    sem,       # (rt,) DMA semaphores
    *,
    k: int,
    t_w: int,
    log_p_stay: float,
    log_p_move: float,
    rt: int,
    unroll2: bool,
):
    """Tables variant: each tile fetches its own (3, k*4, 128) table slice
    straight from the genome-level HBM table by DMA. DMA lane offsets must be
    128-aligned (Mosaic), and per-read offsets are arbitrary — so copy the
    TWO covering 128-blocks (the block axis is a leading dim of tab_ref,
    where dynamic indices are unconstrained) and realign in-register with a
    per-read dynamic roll + lane select. Replaces the XLA per-read
    dynamic_slice + transpose of the three tables (measured ~6 ms/batch at
    bench shapes — the gather serializes and the relayout doubles traffic).
    """
    r = pl.program_id(0)
    l = pl.program_id(1)
    for rr in range(rt):
        off = woff_ref[r * rt + rr] + l * LT
        pltpu.make_async_copy(
            tab_ref.at[:, :, pl.ds(off // 128, 2), 0, :],
            tscr.at[:, :, rr, :, :], sem.at[rr],
        ).start()
    k4 = k * 4
    lane = jax.lax.broadcasted_iota(jnp.int32, (3 * k4, 128), 1)
    parts = []
    for rr in range(rt):
        off = woff_ref[r * rt + rr] + l * LT
        pltpu.make_async_copy(
            tab_ref.at[:, :, pl.ds(off // 128, 2), 0, :],
            tscr.at[:, :, rr, :, :], sem.at[rr],
        ).wait()
        ro = off % 128
        b0 = tscr[:, :, rr, 0, :].reshape(3 * k4, 128)
        b1 = tscr[:, :, rr, 1, :].reshape(3 * k4, 128)
        # value for lane p is b0[p+ro] while p+ro < 128, else b1[p+ro-128];
        # both are the same mod-128 rotate of their block
        rot0 = pltpu.roll(b0, 128 - ro, axis=1)
        rot1 = pltpu.roll(b1, 128 - ro, axis=1)
        parts.append(jnp.where(lane < 128 - ro, rot0, rot1))  # (3*k4, 128)
    tabs = jnp.stack(parts, axis=1).reshape(3, k4, rt, LT)
    em = tabs[0].reshape(k, 4, rt, LT)
    mu = tabs[1].reshape(k, 4, rt, LT)
    iv = tabs[2].reshape(k, 4, rt, LT)
    wm = wm_ref[r, l]
    _rescore_dp_body(xs_ref, em, mu, iv, w_ref, kk_ref, cod_ref, out_ref, wm,
                     k=k, t_w=t_w, log_p_stay=log_p_stay,
                     log_p_move=log_p_move, rt=rt, unroll2=unroll2)


def rescore_fill_pallas(xs, em, mu, iv, w, kk, codes, cfg: AlignConfig,
                        t_w: int, interpret: bool = False, rt: int = RT,
                        unroll2: bool = False):
    """Run the rescore kernel. Shapes: xs (t_w, R, L); em/mu/iv (k*4, R, L);
    w/kk/codes (R, L). Returns scores (4, R, L), already relative to the
    reference base (codes) per position."""
    k = cfg.k
    _, R, L = xs.shape
    assert R % rt == 0 and L % LT == 0, (R, L)
    kernel = functools.partial(
        _rescore_kernel, k=k, t_w=t_w,
        log_p_stay=cfg.log_p_stay, log_p_move=cfg.log_p_move,
        rt=rt, unroll2=unroll2,
    )
    grid = (R // rt, L // LT)
    wmax = jnp.max(
        w.reshape(R // rt, rt, L // LT, LT), axis=(1, 3)
    ).astype(jnp.int32)                              # (R//rt, L//LT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_w, rt, LT), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * 4, rt, LT), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * 4, rt, LT), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * 4, rt, LT), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, LT), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, LT), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, LT), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, rt, LT), lambda r, l, *_: (0, r, l),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, R, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * R * L * t_w * k * 4,
            bytes_accessed=int(xs.size * 4 + em.size * 12 + R * L * 24),
            transcendentals=0,
        ),
        interpret=interpret,
    )(wmax, xs, em, mu, iv, w, kk, codes.astype(jnp.int32))


def rescore_fill_tab_pallas(xs, w, kk, codes, woff, tab4, cfg: AlignConfig,
                            t_w: int, interpret: bool = False, rt: int = RT,
                            unroll2: bool = False):
    """Tables variant of rescore_fill_pallas: the kernel DMAs its own table
    slices from the genome-level stacked table (SubstTables.tab4). Shapes:
    xs (t_w, R, L); w/kk/codes (R, L); woff (R,) i32. Returns (4, R, L),
    ref-relative."""
    k = cfg.k
    _, R, L = xs.shape
    assert R % rt == 0 and L % LT == 0, (R, L)
    kernel = functools.partial(
        _rescore_tab_kernel, k=k, t_w=t_w,
        log_p_stay=cfg.log_p_stay, log_p_move=cfg.log_p_move,
        rt=rt, unroll2=unroll2,
    )
    grid = (R // rt, L // LT)
    wmax = jnp.max(
        w.reshape(R // rt, rt, L // LT, LT), axis=(1, 3)
    ).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_w, rt, LT), lambda r, l, *_: (0, r, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rt, LT), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, LT), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, LT), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, rt, LT), lambda r, l, *_: (0, r, l),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, k * 4, rt, 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((rt,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, R, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * R * L * t_w * k * 4,
            bytes_accessed=int(xs.size * 4 + R * L * (24 * 12 + 24)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(wmax, woff.astype(jnp.int32), xs, tab4, w.astype(jnp.int32),
      kk.astype(jnp.int32), codes.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k", "t_w", "cfg", "interpret",
                                             "rt", "unroll2"))
def base_loglik_local_pallas(
    x: jax.Array,             # (R, T) f32
    path: jax.Array,          # (R, T) i32
    t_len: jax.Array,         # (R,) i32
    window_codes: jax.Array,  # (R, L) i32
    ids: jax.Array,           # (R, N) i32
    level_mean: jax.Array,
    level_std: jax.Array,
    k: int,
    cfg: AlignConfig = AlignConfig(),
    t_w: int = 192,
    interpret: bool = False,
    tables_tab: jax.Array = None,   # (3, k*4, rowsP//128, 1, 128) stacked
                                    # [em, mu, iv] genome tables (optional,
                                    # SubstTables.tab4)
    tables_valid: jax.Array = None, # (rowsP,) bool
    window_off: jax.Array = None,   # (R,) i32 column offset per read
    rt: int = RT,                   # DP-kernel sublane tile (ablation knob)
    unroll2: bool = False,          # 2 DP samples per trip (exact; ablation)
) -> jax.Array:
    """(R, L, 4) base log-likelihoods — Pallas version of
    banded_dp.base_loglik_local_batch (same contract, same results)."""
    R, T = x.shape
    L_in = window_codes.shape[1]
    # pad the position axis up front so the shear/rescore kernels always get
    # lane-aligned tiles (padded positions carry base code 4 ⇒ masked out)
    L = -(-L_in // LT) * LT
    if L != L_in:
        window_codes = jnp.pad(window_codes, ((0, 0), (0, L - L_in)),
                               constant_values=4)
    N = ids.shape[1]

    # ---- window bounds from the global path. The path is monotone (skip
    # transitions only make it jump by 2 — the bisection identity still
    # holds, skipped positions just get empty sample ranges), so segment
    # bounds are bisection counts: seg_start[i] = #{t : path[t] < i},
    # seg_end[i] = #{t : path[t] <= i} — one dense Pallas counting pass
    # instead of the segment_min scatter (86 ms -> ~3 ms at bench shapes).
    # Count index i runs 0..N so both bounds come from one array.
    tmask = jnp.arange(T)[None, :] < t_len[:, None]
    Np = -(-(N + 1) // 128) * 128
    # sentinel >= Np so the kernel's live-mask excludes padded samples (the
    # used count lanes are <= N, where no sentinel ever counted anyway)
    path_safe = jnp.where(tmask, path, Np)
    cnt = path_counts_pallas(path_safe, Np, t_len=t_len,
                             interpret=interpret)  # (R, Np)

    first_pos = path[:, 0]
    last_t = jnp.maximum(t_len - 1, 0)
    last_pos = jnp.take_along_axis(path, last_t[:, None], axis=1)[:, 0]

    i_idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    p_lo = jnp.clip(i_idx - k + 1, 0, N - 1)
    p_hi = jnp.clip(i_idx, 0, N - 1)
    p_lo = jnp.maximum(p_lo, first_pos[:, None])
    p_hi = jnp.minimum(p_hi, last_pos[:, None])
    kk = p_hi - p_lo + 1
    valid_i = (kk > 0) & (window_codes < 4)

    # S[i] = cnt[clip(i-k+1, 0, N-1)] and E[i] = cnt[clip(i, 0, N-1) + 1]:
    # static edge-clamped shifts of the count row, so plain pad+slice — no
    # gathers. Clipping p_lo/p_hi against first/last_pos is unnecessary here
    # because cnt saturates (0 below first_pos, t_len above last_pos).
    s_row = cnt[:, :N]                                   # index i-k+1 in [0, N)
    S = jnp.pad(s_row, ((0, 0), (k - 1, max(L - N - (k - 1), 0))),
                mode="edge")[:, :L]
    e_row = cnt[:, 1 : N + 1]                            # index i+1 in [1, N]
    E = jnp.pad(e_row, ((0, 0), (0, max(L - N, 0))), mode="edge")[:, :L]
    W = jnp.clip(E - S, 0, t_w)

    # ---- xs: per-position sample windows
    span = 2048
    S_c = jnp.clip(S, 0, T - 1)
    if (not interpret and T >= span + 256 and T % 128 == 0
            and R % RT == 0 and L % LT == 0):
        # shear-via-MXU kernel (XLA take_along_axis measured 1157 ms here);
        # positions whose tile spread exceeds the slab are masked out
        S_tiles = S_c.reshape(R, L // LT, LT)
        base = shear_slab_base(S_c, T, span)
        spread_ok = (S_tiles - base[:, :, None]) <= (span - 1)
        W = jnp.where(spread_ok.reshape(R, L), W, 0)
        xs = shear_gather_pallas(x, S_c, t_w, span=span)
    else:
        samp = S_c[:, :, None] + jnp.arange(t_w, dtype=jnp.int32)[None, None, :]
        samp_safe = jnp.clip(samp, 0, T - 1)
        xs = jnp.take_along_axis(
            x[:, None, :], samp_safe.reshape(R, L * t_w)[:, None, :], axis=2
        ).reshape(R, L, t_w)
        xs = jnp.transpose(xs, (2, 0, 1))             # (t_w, R, L)

    ref_base = window_codes
    if tables_tab is not None:
        # genome-level substituted tables: the rescore kernel DMAs each
        # tile's table slice itself (see _rescore_tab_kernel) — no per-read
        # XLA slices or transposes. Host-side only the (cheap) validity row
        # is sliced; read-local edge positions (clipped windows) are masked
        # below (kk == k required).
        def one(o):
            return jax.lax.dynamic_slice(tables_valid, (o,), (L,))
        valid_g = jax.vmap(one)(window_off.astype(jnp.int32))
        edge_ok = (kk == k) & valid_g
        valid_i = valid_i & edge_ok
        j_ok = jnp.ones((R, L, k), bool)
        ids_ok = jnp.ones((R, L, k), bool)
    else:
        j_id = jnp.arange(k, dtype=jnp.int32)[None, None, :]
        p = p_lo[:, :, None] + j_id                        # (R, L, k)
        j_ok = j_id < kk[:, :, None]
        p_safe = jnp.clip(p, 0, N - 1)
        ids_p = jnp.take_along_axis(
            ids[:, None, :], p_safe.reshape(R, L * k)[:, None, :], axis=2
        ).reshape(R, L, k)
        ids_ok = ids_p >= 0
        off = i_idx[:, :, None] - p
        inside = (off >= 0) & (off < k)
        pow4 = jnp.asarray([4 ** (k - 1 - o) for o in range(k)], jnp.int32)
        w4 = jnp.where(inside, pow4[jnp.clip(off, 0, k - 1)], 0)
        b_id = jnp.arange(4, dtype=jnp.int32)[None, None, None, :]
        nid = ids_p[..., None] + (b_id - ref_base[:, :, None, None]) * w4[..., None]
        nid = jnp.clip(nid, 0, level_mean.shape[0] - 1)    # (R, L, k, 4)
        ids_p = jnp.where(ids_ok, ids_p, 0)
        mu_s = level_mean[nid]
        sg_s = level_std[nid]
        em = -jnp.log(sg_s) - _HALF_LOG_2PI
        iv = 0.5 / (sg_s * sg_s)
        dead = ~(j_ok & ids_ok)
        em = jnp.where(dead[..., None], NEG_INF, em)

        def to_kernel_layout(a):   # (R, L, k, 4) -> (k*4, R, L)
            return jnp.transpose(a, (2, 3, 0, 1)).reshape(k * 4, R, L)

        em_kl = to_kernel_layout(em)
        mu_kl = to_kernel_layout(mu_s)
        iv_kl = to_kernel_layout(iv)

    # pad to kernel tile multiples (padding lanes are dead: W=0, em=NEG_INF)
    Rp = -(-R // rt) * rt
    Lp = -(-L // LT) * LT
    pr, plp = Rp - R, Lp - L

    def pad(a, fill=0.0):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, pr), (0, plp)],
                       constant_values=fill)

    if tables_tab is not None:
        scores = rescore_fill_tab_pallas(
            pad(xs), pad(W.astype(jnp.int32)), pad(kk.astype(jnp.int32), 1),
            pad(jnp.clip(ref_base, 0, 3), 0.0),
            jnp.pad(window_off.astype(jnp.int32), (0, pr)), tables_tab,
            cfg, t_w, interpret=interpret, rt=rt, unroll2=unroll2,
        )[:, :R, :L]                                   # (4, R, L), ref-relative
    else:
        scores = rescore_fill_pallas(
            pad(xs), pad(em_kl.astype(jnp.float32), NEG_INF),
            pad(mu_kl.astype(jnp.float32)),
            pad(iv_kl.astype(jnp.float32), 1.0),
            pad(W.astype(jnp.int32)), pad(kk.astype(jnp.int32), 1),
            pad(jnp.clip(ref_base, 0, 3), 0.0), cfg, t_w,
            interpret=interpret, rt=rt, unroll2=unroll2,
        )[:, :R, :L]                                   # (4, R, L), ref-relative
    out = jnp.transpose(scores, (1, 2, 0))             # (R, L, 4)
    all_ok = valid_i & (W > 0) & jnp.all(jnp.where(j_ok, ids_ok, True), axis=2)
    out = jnp.where(all_ok[:, :, None], out, 0.0).astype(jnp.float32)
    return out[:, :L_in, :]


# --------------------------------------------------------------------------
# Shear gather: xs[s, r, i] = x[r, S[r, i] + s], two-level. The XLA
# take_along_axis form measured 1157 ms at bench shapes (TPU gathers
# serialize per element). A one-level one-hot matmul over the whole slab
# (span=2048 contraction per gathered element) is MXU-slot-bound: measured
# ~15 ms ≈ the predicted 3 blocks · M=96 · K=2048 · N=128 / 16384 MAC-slots
# per cycle. Two-level version: write the offset d = S − base as
# d = 128·q + r; the 128-granule gather C[q[lane]+a] is a SMALL matmul
# (contraction over span/128 = 16 coarse rows, with the f32-exactness
# 3-split folded into the contraction axis → K = 48), and the residual
# r ∈ [0, 128) is a per-lane SUBLANE log-shift (7 select+concat steps).
# ~12x less MXU work; exact f32 (the split terms are bf16-exact, the 0/1
# one-hot is bf16-exact, so the MXU's bf16 operand rounding is lossless).
# --------------------------------------------------------------------------

def shear_slab_base(S, T: int, span: int, lt: int = LT):
    """Aligned slab base per (read, position-tile) — shared by kernel & mask."""
    R, L = S.shape
    S_tiles = S.reshape(R, L // lt, lt)
    base = jnp.clip(jnp.min(S_tiles, axis=2), 0, T - span - 256)
    return (base // 128) * 128


def shear_gather_pallas(x, S, t_w: int, span: int = 4096, rt: int = 8,
                        interpret: bool = False, wmax=None):
    """xs[s, r, i] = x[r, S[r, i] + s] — (t_w, R, L) f32, exact.

    Caller contract: 0 <= S and the per-(read, 128-position-tile) spread
    max(S_tile) - min(S_tile) must be < span (positions violating it must be
    masked out by the caller, see base_loglik_local_pallas; their xs values
    come out 0.0 — finite, never garbage). x rows must be at least
    span + 256 samples long (pad with zeros).

    wmax is accepted for signature compatibility and ignored: the two-level
    gather is cheap enough that every row is always written (the round-2
    unwritten-rows contract and its ADVICE-flagged fragility are gone).

    Decomposition per (read, position-tile): d = S − base = 128·q + r with
    base 128-aligned. Coarse: G[128a + w0, lane] = x[base + 128(q+a) + w0]
    via dot_general(C_splits (48, 128), oneq3 (48, lt)) per a-block, where
    C[i] = x[base + 128i : ...+128] are coarse slab rows, the f32→3×bf16
    exactness split rides the contraction axis, and oneq is the 0/1 one-hot
    of q. Fine: xs[s] = G[r + s] — a per-lane sublane log-shift (7
    concat+select steps on the bits of r).
    """
    R, T = x.shape
    L = S.shape[1]
    lt = LT
    assert R % rt == 0 and L % lt == 0
    assert T >= span + 256, (T, span)
    assert span % 128 == 0 and T % 128 == 0
    nq = span // 128                  # coarse granules addressable by oneq
    n_a = (t_w + 127) // 128 + 1      # G rows = 128·n_a must cover r + t_w
    nc = nq + n_a - 1                 # coarse slab rows fetched per tile
    assert 128 * n_a >= 127 + t_w
    # base clip (shear_slab_base) guarantees base + 128·(nc-1) + 127 < T:
    assert 128 * (nc - 1) + 127 <= span + 255, (span, t_w)

    base = shear_slab_base(S, T, span, lt)                        # (R, L/lt)
    base_sp = base.T.reshape(L // lt, R).astype(jnp.int32)

    # (R, T/128, 1, 128): the coarse-row axis is a LEADING dim, so the
    # kernel can dynamic-index it at arbitrary (unaligned) q0 — a (R, T/128,
    # 128) layout would put it on sublanes, where Mosaic requires 8-aligned
    # dynamic offsets. The reshape is layout-preserving (free).
    x3 = x.reshape(R, T // 128, 1, 128)

    grid = (R // rt, L // lt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, T // 128, 1, 128), lambda r, l, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, lt), lambda r, l, *_: (r, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t_w, rt, lt), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM
        ),
    )

    def kernel_wrap(sp_ref, x3_ref, s_ref, xs_ref):
        r = pl.program_id(0)
        l = pl.program_id(1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (nq, lt), 0)
        for rr in range(rt):
            base_v = sp_ref[l, r * rt + rr]
            q0 = base_v // 128
            C = jnp.concatenate(
                [x3_ref[rr, pl.ds(q0 + i, 1), 0, :] for i in range(nc)],
                axis=0)                                      # (nc, 128)
            # f32 = hi + mid + lo, each bf16-exact (8+8+8 mantissa bits), so
            # the MXU's bf16 operand rounding loses nothing and the gather
            # is bit-exact (single-pass f32 matmul measured ~1e-2 error —
            # caught by scripts/tpu_smoke.py tier 3)
            hi = C.astype(jnp.bfloat16).astype(jnp.float32)
            r1 = C - hi
            mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
            lo = r1 - mid
            d = (s_ref[rr, :] - base_v).reshape(1, lt)       # [0, span)
            q = d // 128
            rfine = d % 128
            oneq = (qi == q).astype(jnp.float32)             # (nq, lt)
            oneq3 = jnp.concatenate([oneq, oneq, oneq], axis=0)
            gs = []
            for a in range(n_a):
                ca = jnp.concatenate(
                    [hi[a : a + nq], mid[a : a + nq], lo[a : a + nq]],
                    axis=0)                                  # (3*nq, 128)
                gs.append(jax.lax.dot_general(
                    ca, oneq3, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))     # (128, lt)
            G = jnp.concatenate(gs, axis=0)                  # (128*n_a, lt)
            # fine: xs[s] = G[rfine + s] — per-lane shift toward row 0 by
            # rfine, as a log-composition of static sublane rotations.
            # Wrapped rows land at w >= 128*n_a - 127 > t_w, never read.
            for b in range(7):
                amt = 1 << b
                rolled = jnp.concatenate([G[amt:], G[:amt]], axis=0)
                G = jnp.where((rfine & amt) != 0, rolled, G)
            xs_ref[:, rr, :] = G[:t_w]

    return pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_w, R, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * L * 3 * nq * 128 * n_a,
            bytes_accessed=int(x.size * 4 + R * L * (t_w + 1) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(base_sp, x3, S)
