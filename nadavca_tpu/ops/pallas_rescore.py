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


def _count_kernel(p_ref, out_ref, *, np_lanes, chunk, r_tile):
    c = pl.program_id(1)
    blk = p_ref[:]                                   # (RT, chunk)
    # the path is monotone per read, so this chunk's values span a narrow
    # window [m0, m1] (~chunk/dwell positions). Lanes i <= m0 count nothing;
    # lanes i > m1 count every sample; only lane tiles intersecting (m0, m1]
    # need the dense per-sample compare — typically 1 of np_lanes/128 tiles.
    m0 = jnp.min(blk)
    m1 = jnp.max(blk)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros((r_tile, np_lanes), jnp.int32)

    for lt0 in range(0, np_lanes, 128):
        iota = jax.lax.broadcasted_iota(jnp.int32, (r_tile, 128), 1) + lt0

        @pl.when(m1 < lt0)          # all samples < every lane in this tile
        def _(lt0=lt0):
            out_ref[:, lt0 : lt0 + 128] = out_ref[:, lt0 : lt0 + 128] + chunk

        @pl.when((lt0 <= m1) & (m0 < lt0 + 127))     # transition tile
        def _(lt0=lt0, iota=iota):
            # Python loop ⇒ every lane index is STATIC. A dynamic lane index
            # here (e.g. fori_loop with pl.ds(s, 1)) is rejected by Mosaic
            # ("cannot statically prove index is a multiple of 128") — the
            # round-2 regression, VERDICT.md weakness #1.
            acc = jnp.zeros((r_tile, 128), jnp.int32)
            for s in range(chunk):
                col = blk[:, s : s + 1]                         # (RT, 1)
                acc = acc + (col < iota).astype(jnp.int32)
            out_ref[:, lt0 : lt0 + 128] = out_ref[:, lt0 : lt0 + 128] + acc
        # remaining case (lt0 + 127 <= m0): every lane <= all samples, add 0


def path_counts_pallas(path_safe, n_lanes: int, rt: int = 8,
                       chunk: int = 128, interpret: bool = False):
    """C[r, i] = #{t : path_safe[r, t] < i} for i in [0, n_lanes).

    For a monotone nondecreasing path this is searchsorted-left as a dense
    counting reduction — the XLA alternative (segment_min scatter over R·T
    elements) measured 86 ms at bench shapes vs ~3 ms here. Masked samples
    must be pre-set to >= n_lanes - 1 so they never count.
    """
    R, T = path_safe.shape
    assert n_lanes % 128 == 0
    Rp = -(-R // rt) * rt
    Tp = -(-T // chunk) * chunk
    if Rp != R or Tp != T:
        # padded samples carry the sentinel (never < any lane index)
        path_safe = jnp.pad(path_safe, ((0, Rp - R), (0, Tp - T)),
                            constant_values=n_lanes)
    kernel = functools.partial(
        _count_kernel, np_lanes=n_lanes, chunk=chunk, r_tile=rt
    )
    out = pl.pallas_call(
        kernel,
        grid=(Rp // rt, Tp // chunk),
        in_specs=[
            pl.BlockSpec((rt, chunk), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, n_lanes), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, n_lanes), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * Tp * n_lanes,
            bytes_accessed=int(Rp * Tp * 4 + Rp * n_lanes * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(path_safe.astype(jnp.int32))
    return out[:R]


def _rescore_kernel(
    wm_ref,    # (R//RT, L//LT) i32 scalar-prefetch: max live W per tile
    xs_ref,    # (t_w, RT, LT) f32: sample s of each position's window
    em_ref,    # (k*4, RT, LT) f32: -log sigma' - c, NEG_INF at dead (j, b)
    mu_ref,    # (k*4, RT, LT) f32: substituted level means
    iv_ref,    # (k*4, RT, LT) f32: 0.5 / sigma'^2
    w_ref,     # (RT, LT) i32: live window length per position
    kk_ref,    # (RT, LT) i32: number of live window slots (<= k)
    out_ref,   # (4, RT, LT) f32: final DP scores per base
    *,
    k: int,
    t_w: int,
    log_p_stay: float,
    log_p_move: float,
):
    em = em_ref[:].reshape(k, 4, RT, LT)
    mu = mu_ref[:].reshape(k, 4, RT, LT)
    iv = iv_ref[:].reshape(k, 4, RT, LT)
    w = w_ref[:]

    x0 = xs_ref[0]                                   # (RT, LT)
    d0 = x0[None, None] - mu
    emit0 = em - d0 * d0 * iv
    init_mask = jax.lax.broadcasted_iota(jnp.int32, (k, 4, RT, LT), 0) == 0
    v0 = jnp.where(init_mask, emit0, NEG_INF)

    neg_row = jnp.full((1, 4, RT, LT), NEG_INF, jnp.float32)

    def body(s, v):
        x = xs_ref[pl.ds(s, 1)][0]                   # (RT, LT)
        d = x[None, None] - mu
        emit = em - d * d * iv
        stay = v + log_p_stay
        move = jnp.concatenate([neg_row, v[: k - 1]], axis=0) + log_p_move
        v_new = emit + jnp.maximum(stay, move)
        active = (s < w)[None, None]                 # (1, 1, RT, LT)
        return jnp.where(active, v_new, v)

    # dynamic trip count: steps s >= max(W) of this tile are identity for
    # every lane (the active mask), so stopping at the tile's own max is
    # exact. Typical windows are ~k·dwell ≈ 60 samples vs the static
    # t_w = 192 bound — most tiles run 2–3× fewer steps.
    wm = jnp.minimum(wm_ref[pl.program_id(0), pl.program_id(1)], t_w)
    v = jax.lax.fori_loop(1, wm, body, v0)

    kk1 = kk_ref[:] - 1                               # (RT, LT)
    out = jnp.zeros((4, RT, LT), jnp.float32)
    for j in range(k):
        out = out + jnp.where((kk1 == j)[None], v[j], 0.0)
    out_ref[:] = out


def rescore_fill_pallas(xs, em, mu, iv, w, kk, cfg: AlignConfig, t_w: int,
                        interpret: bool = False):
    """Run the rescore kernel. Shapes: xs (t_w, R, L); em/mu/iv (k*4, R, L);
    w/kk (R, L). Returns scores (4, R, L)."""
    k = cfg.k
    _, R, L = xs.shape
    assert R % RT == 0 and L % LT == 0, (R, L)
    kernel = functools.partial(
        _rescore_kernel, k=k, t_w=t_w,
        log_p_stay=cfg.log_p_stay, log_p_move=cfg.log_p_move,
    )
    grid = (R // RT, L // LT)
    wmax = jnp.max(
        w.reshape(R // RT, RT, L // LT, LT), axis=(1, 3)
    ).astype(jnp.int32)                              # (R//RT, L//LT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_w, RT, LT), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * 4, RT, LT), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * 4, RT, LT), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * 4, RT, LT), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, LT), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, LT), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, RT, LT), lambda r, l, *_: (0, r, l),
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
    )(wmax, xs, em, mu, iv, w, kk)


@functools.partial(jax.jit, static_argnames=("k", "t_w", "cfg", "interpret"))
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
    tables_mu: jax.Array = None,    # (2*Gp, k*4) genome subst tables (optional)
    tables_em: jax.Array = None,    # precomputed -log sg' - c
    tables_iv: jax.Array = None,    # precomputed 0.5/sg'^2
    tables_valid: jax.Array = None, # (2*Gp,) bool
    window_off: jax.Array = None,   # (R,) i32 row offset per read
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
    path_safe = jnp.where(tmask, path, N)
    Np = -(-(N + 1) // 128) * 128
    cnt = path_counts_pallas(path_safe, Np, interpret=interpret)  # (R, Np)

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
        # per-tile max live window, shared with the rescore fill kernel's
        # dynamic trip count: shear rows >= wm are never read downstream
        wm_tiles = jnp.max(
            W.reshape(R // RT, RT, L // LT, LT), axis=(1, 3)
        ).astype(jnp.int32)
        xs = shear_gather_pallas(x, S_c, t_w, span=span, wmax=wm_tiles)
    else:
        samp = S_c[:, :, None] + jnp.arange(t_w, dtype=jnp.int32)[None, None, :]
        samp_safe = jnp.clip(samp, 0, T - 1)
        xs = jnp.take_along_axis(
            x[:, None, :], samp_safe.reshape(R, L * t_w)[:, None, :], axis=2
        ).reshape(R, L, t_w)
        xs = jnp.transpose(xs, (2, 0, 1))             # (t_w, R, L)

    ref_base = window_codes
    if tables_mu is not None:
        # genome-level substituted tables: one contiguous slice per read
        # replaces ~200 ms of per-batch table gathers; read-local edge
        # positions (clipped windows) are masked below (kk == k required).
        # Tables are stored (k*4, rows) so the slice lands directly in the
        # kernel's layout — only leading dims move in the transpose below.
        def one(o):
            return (jax.lax.dynamic_slice(tables_mu, (0, o), (k * 4, L)),
                    jax.lax.dynamic_slice(tables_em, (0, o), (k * 4, L)),
                    jax.lax.dynamic_slice(tables_iv, (0, o), (k * 4, L)),
                    jax.lax.dynamic_slice(tables_valid, (o,), (L,)))
        mu_kl, em_kl, iv_kl, valid_g = jax.vmap(one)(window_off.astype(jnp.int32))
        mu_kl = jnp.transpose(mu_kl, (1, 0, 2))    # (k*4, R, L)
        em_kl = jnp.transpose(em_kl, (1, 0, 2))
        iv_kl = jnp.transpose(iv_kl, (1, 0, 2))
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
    Rp = -(-R // RT) * RT
    Lp = -(-L // LT) * LT
    pr, plp = Rp - R, Lp - L

    def pad(a, fill=0.0):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, pr), (0, plp)],
                       constant_values=fill)

    scores = rescore_fill_pallas(
        pad(xs), pad(em_kl.astype(jnp.float32), NEG_INF),
        pad(mu_kl.astype(jnp.float32)),
        pad(iv_kl.astype(jnp.float32), 1.0),
        pad(W.astype(jnp.int32)), pad(kk.astype(jnp.int32), 1), cfg, t_w,
        interpret=interpret,
    )[:, :R, :L]                                       # (4, R, L)
    scores = jnp.transpose(scores, (1, 2, 0))          # (R, L, 4)
    ref_score = jnp.take_along_axis(
        scores, jnp.clip(ref_base, 0, 3)[:, :, None].astype(jnp.int32), axis=2
    )
    out = scores - ref_score
    all_ok = valid_i & (W > 0) & jnp.all(jnp.where(j_ok, ids_ok, True), axis=2)
    out = jnp.where(all_ok[:, :, None], out, 0.0).astype(jnp.float32)
    return out[:, :L_in, :]


# --------------------------------------------------------------------------
# Shear gather: xs[s, r, i] = x[r, S[r, i] + s] built with one-hot matmuls on
# the MXU. The XLA take_along_axis form of this gather measured 1157 ms at
# bench shapes (TPU gathers serialize per element); as a matmul against a
# 0/1 shear matrix it is exact (rows of 0s plus a single 1 ⇒ f32 products
# are exact) and runs at MXU speed (~1 TFLOP total ⇒ tens of ms).
# --------------------------------------------------------------------------

def shear_slab_base(S, T: int, span: int, lt: int = LT):
    """Aligned slab base per (read, position-tile) — shared by kernel & mask."""
    R, L = S.shape
    S_tiles = S.reshape(R, L // lt, lt)
    base = jnp.clip(jnp.min(S_tiles, axis=2), 0, T - span - 256)
    return (base // 128) * 128


def shear_gather_pallas(x, S, t_w: int, span: int = 4096, rt: int = 8,
                        interpret: bool = False, wmax=None):
    """xs[s, r, i] = x[r, S[r, i] + s] — (t_w, R, L) f32.

    Caller contract: 0 <= S and the per-(read, 128-position-tile) spread
    max(S_tile) - min(S_tile) must be < span (positions violating it must be
    masked out by the caller, see base_loglik_local_pallas). x rows must be
    at least span + t_w long (pad with zeros).

    wmax (optional): (R//rt, L//lt) i32 — max live window length per tile.
    Rows s >= wmax of a tile are left UNWRITTEN (garbage in the output);
    callers must not read them. The rescore fill kernel bounds its t-loop by
    the same per-tile max, so sharing one wmax array makes the skip exact;
    typical windows are ~k·dwell ≈ 60 samples vs t_w = 192, so most tiles
    skip ~2/3 of their shear matmuls.
    """
    R, T = x.shape
    L = S.shape[1]
    lt = LT
    # m_rows rolled slab copies per matmul: a bigger M amortizes MXU pipeline
    # fill across the shear matmuls (measured 13.9/10.0/9.2 ms at 8/16/32)
    m_rows = next(m for m in (32, 16, 8, 4, 2, 1) if t_w % m == 0)
    pad_w = 256  # slab width = span + pad_w (multiple of 128)
    assert R % rt == 0 and L % lt == 0
    assert T >= span + pad_w, (T, span)
    assert t_w <= pad_w - m_rows
    assert span % 128 == 0 and T % 128 == 0

    # per-(row-tile, position-tile) slab base: clipped so the slab fits and
    # floored to a 128 multiple (Mosaic requires aligned dynamic lane offsets)
    base = shear_slab_base(S, T, span, lt)                        # (R, L/lt)
    # scalar prefetch wants a flat layout indexed by grid: (L/lt, R)
    base_sp = base.T.reshape(L // lt, R).astype(jnp.int32)
    if wmax is None:
        wm_sp = jnp.full((R // rt, L // lt), t_w, jnp.int32)
    else:
        # clamp to >= 1 so the s0 = 0 matmul block always runs: the rescore
        # fill kernel unconditionally reads xs row 0 for its DP init even
        # when a tile's live window max is 0 (ADVICE r2: unwritten rows must
        # never be readable)
        wm_sp = jnp.clip(wmax, 1, t_w).astype(jnp.int32)

    grid = (R // rt, L // lt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, T), lambda r, l, *_: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, lt), lambda r, l, *_: (r, l), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t_w, rt, lt), lambda r, l, *_: (0, r, l), memory_space=pltpu.VMEM
        ),
    )

    def kernel_wrap(sp_ref, wm_ref, x_ref, s_ref, xs_ref):
        r = pl.program_id(0)
        l = pl.program_id(1)
        wm = wm_ref[r, l]

        u_iota = jax.lax.broadcasted_iota(jnp.int32, (span, lt), 0)
        for rr in range(rt):
            base_v = pl.multiple_of(sp_ref[l, r * rt + rr], 128)
            slab = x_ref[rr, pl.ds(base_v, span + pad_w)].reshape(1, span + pad_w)
            d = (s_ref[rr, :] - base_v).reshape(1, lt)
            m0 = (u_iota == d).astype(jnp.float32)
            # m_rows rolled copies (all lane-offset 0, so the concat is
            # legal); wrapped tail lanes are never read because d + t_w stays
            # inside the slab (see the caller's spread mask)
            width = span + pad_w
            slab_m = jnp.concatenate(
                [pltpu.roll(slab, (width - ss) % width, axis=1)
                 for ss in range(m_rows)], axis=0
            )                                               # (m_rows, width)
            # EXACT f32 gather on the MXU: the MXU's DEFAULT f32 matmul
            # rounds operands to bf16 (measured ~1e-2 error on the gathered
            # samples — caught by scripts/tpu_smoke.py tier 3). Split each
            # slab value into three bf16-exact terms (8+8+8 of the 24
            # mantissa bits); each term's product with the 0/1 one-hot is
            # then exact, and hi+mid+lo reassembles the original f32
            # bit-for-bit. Packing the three splits along the M axis keeps
            # it ONE matmul per block — M=3·m_rows amortizes MXU pipeline
            # fill, so this costs ~1.3x a single pass, not 3x (HIGHEST
            # measured 2.0x).
            hi = slab_m.astype(jnp.bfloat16).astype(jnp.float32)
            r1 = slab_m - hi
            mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
            lo = r1 - mid
            slab3 = jnp.concatenate([hi, mid, lo], axis=0)  # (3*m_rows, width)
            for s0 in range(0, t_w, m_rows):
                # rows past the tile's max live window are never read by the
                # rescore fill (its t-loop stops at the same wm) — skip them
                @pl.when(s0 < wm)
                def _(s0=s0):
                    rows = slab3[:, s0 : s0 + span]
                    blk3 = jnp.dot(rows, m0, preferred_element_type=jnp.float32)
                    blk = (blk3[:m_rows] + blk3[m_rows : 2 * m_rows]
                           + blk3[2 * m_rows :])
                    xs_ref[pl.ds(s0, m_rows), rr, :] = blk

    return pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_w, R, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * L * t_w * span,
            bytes_accessed=int(x.size * 4 + R * L * (t_w + 1) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(base_sp, wm_sp, x, S)
