"""Per-batch orchestration: reads → anchored, padded batches → device DP → SNPs.

This is the rebuild of the reference's L2 orchestration (SURVEY.md §3.1/§3.5):
host does ingest, normalization, anchoring, window/level precompute and batch
padding; ONE device_put ships the batch; the device runs banded Viterbi (Pallas
on TPU, lax.scan elsewhere), segment statistics, base-substitution likelihoods
and the genome scatter-add as one jitted program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .anchor import Anchor, SeedIndex, anchor_basecall, signal_anchor_path
from .config import AlignConfig
from .genome import Genome, kmer_ids
from .kmer_model import KmerModel
from .ops import banded_dp, pallas_dp
from .sched.bands import ChunkedBands, build_chunked_bands


@dataclasses.dataclass
class ReadRecord:
    """A read after host-side preprocessing, ready for batching."""

    read_id: str
    signal: np.ndarray        # (T,) float32 normalized
    anchor: Anchor
    anchor_path: np.ndarray   # (T,) float64 window k-mer position per sample
    window_codes: np.ndarray  # (L,) int8
    # expected levels of the window, computed once during preprocessing and
    # reused by assemble_batch (profiling showed the duplicate
    # expected_signal call was ~15% of host prep)
    mu: Optional[np.ndarray] = None      # (N,) f32
    sigma: Optional[np.ndarray] = None   # (N,) f32


@dataclasses.dataclass
class Batch:
    """Padded device-ready batch plus host-side metadata."""

    x: np.ndarray             # (R, T) f32
    t_len: np.ndarray         # (R,) i32
    mu: np.ndarray            # (R, N) f32
    sigma: np.ndarray         # (R, N) f32
    n_ref: np.ndarray         # (R,) i32
    bands: ChunkedBands
    codes: np.ndarray         # (R, L) i32 window bases (4 = pad)
    ids: np.ndarray           # (R, N) i32 kmer ids (-1 = pad)
    window_start: np.ndarray  # (R,) i32 genome coord of window start
    window_len: np.ndarray    # (R,) i32 = L true bases
    strand: np.ndarray        # (R,) i32
    read_ids: List[str]
    contigs: List[str]        # contig per read (padded rows repeat the first)
    n_reads: int              # true (unpadded) read count

    @property
    def shapes(self):
        return (self.x.shape, self.mu.shape)


def preprocess_read(
    signal: np.ndarray,
    basecall: str,
    move_index: np.ndarray,
    index: SeedIndex,
    genome: Genome,
    read_id: str = "?",
    model: Optional[KmerModel] = None,
) -> Optional[ReadRecord]:
    """Anchor one normalized read; None if anchoring fails.

    When a pore model is given, the read is re-calibrated against it: a
    trimmed linear fit of the signal onto the expected levels along the
    anchor path refines the raw median/MAD normalization, whose shift is
    biased by the window's level composition (a read over a high-level
    region gets its whole signal shifted by the local level median — a
    systematic, cross-read-correlated error that fabricates confident SNPs).
    """
    a = anchor_basecall(index, basecall)
    if a is None:
        return None
    window = genome.window(a.contig, a.ref_start, a.ref_end, a.strand)
    path = signal_anchor_path(a, move_index, len(signal))
    signal = np.asarray(signal, np.float32)
    mu = sigma = None
    if model is not None:
        mu, sigma = model.expected_signal(window)
        if len(mu) > 1:
            ap = np.clip(np.round(path).astype(np.int64), 0, len(mu) - 1)
            pred = mu[ap].astype(np.float64)
            x = signal.astype(np.float64)
            keep = np.ones(len(x), bool)
            for _ in range(2):  # fit, trim outliers, refit
                vp = pred[keep].var()
                if vp < 1e-6 or keep.sum() < 16:
                    break
                aa = np.cov(pred[keep], x[keep])[0, 1] / vp
                bb = x[keep].mean() - aa * pred[keep].mean()
                resid = x - (aa * pred + bb)
                rs = resid[keep].std()
                # accept only a sane, well-correlated fit — a decorrelated
                # anchor (bad basecall / misanchor) would otherwise drive the
                # slope toward 0 and exploding 1/a scale corrections
                r2 = 1.0 - (resid[keep] ** 2).mean() / max(x[keep].var(), 1e-9)
                if 0.5 < aa < 2.0 and r2 > 0.5:
                    signal = ((x - bb) / aa).astype(np.float32)
                keep = np.abs(resid) < 3.0 * rs
    return ReadRecord(
        read_id=read_id,
        signal=signal,
        anchor=a,
        anchor_path=path,
        window_codes=window,
        mu=mu,
        sigma=sigma,
    )


def make_preprocessor(
    genome: Genome,
    cfg: AlignConfig,
    model: Optional[KmerModel] = None,
    mode: str = "auto",
):
    """Callable(raw_read) -> Optional[ReadRecord], native C++ or Python.

    mode: "auto" (native when the toolchain builds, else Python), "native",
    "python". The native engine (csrc/prep.cpp) is ~3x faster per core and
    releases the GIL, so the CLI's thread workers scale with it.
    """
    from .io import fast5 as fast5mod

    if mode not in ("auto", "native", "python"):
        raise ValueError(f"unknown prep mode {mode!r}")
    if mode != "python":
        try:
            from . import prep_native

            native = prep_native.NativePrep(genome)

            def work_native(raw):
                if raw.basecall is None or raw.move_index is None:
                    return None
                return native.prep_read(
                    raw.signal_pa, raw.basecall, raw.move_index, cfg,
                    model=model, read_id=raw.read_id,
                )

            return work_native
        except Exception:
            if mode == "native":
                raise

    index = SeedIndex(genome)

    def work_python(raw):
        if raw.basecall is None or raw.move_index is None:
            return None
        sig = fast5mod.normalize_signal(raw.signal_pa, cfg.normalization)
        return preprocess_read(sig, raw.basecall, raw.move_index, index,
                               genome, raw.read_id, model=model)

    return work_python


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _bucket(v: int, edges) -> int:
    for e in edges:
        if v <= e:
            return e
    return _round_up(v, edges[-1] if edges else 1024)


def assemble_batch(
    records: Sequence[ReadRecord],
    model: KmerModel,
    cfg: AlignConfig,
    pad_reads_to: Optional[int] = None,
    pad_signal_to: Optional[int] = None,
    pad_window_to: Optional[int] = None,
) -> Batch:
    """Pad preprocessed reads into one device batch.

    Shapes are canonicalized — R rounds up to the read tile, T to the signal
    bucket edges, L to a 256 multiple — so repeated batches hit the same
    compiled executable (SURVEY.md §7.3 item 3: bucketed padding for shape
    stability). Multi-host callers pass pad_signal_to/pad_window_to (agreed
    across processes) so every process compiles the identical program; an
    empty ``records`` yields an all-padding batch (n_reads=0) for processes
    that run out of local reads before the globally-agreed batch count.
    """
    n = len(records)
    tile = max(cfg.read_tile, 8)
    R = pad_reads_to or _round_up(max(n, 1), tile)
    assert R % tile == 0 and R >= n, (R, tile, n)
    T_raw = max([len(r.signal) for r in records] + [pad_signal_to or 1])
    T = _round_up(_bucket(T_raw, cfg.bucket_edges), cfg.signal_chunk)
    L_raw = max([len(r.window_codes) for r in records]
                + [pad_window_to or (model.k + 1)])
    L = _round_up(L_raw, 256)
    N = L - model.k + 1

    x = np.zeros((R, T), np.float32)
    t_len = np.zeros(R, np.int32)
    mu = np.zeros((R, N), np.float32)
    sigma = np.ones((R, N), np.float32)
    n_ref = np.zeros(R, np.int32)
    anchors = np.zeros((R, T), np.float64)
    codes = np.full((R, L), 4, np.int32)
    ids = np.full((R, N), -1, np.int32)
    wstart = np.zeros(R, np.int32)
    wlen = np.zeros(R, np.int32)
    strand = np.ones(R, np.int32)
    read_ids = []
    contigs = []

    for r, rec in enumerate(records):
        t = len(rec.signal)
        x[r, :t] = rec.signal
        t_len[r] = t
        if rec.mu is not None:
            m, s = rec.mu, rec.sigma
        else:
            m, s = model.expected_signal(rec.window_codes)
        mu[r, : len(m)] = m
        sigma[r, : len(m)] = s
        n_ref[r] = len(m)
        anchors[r, :t] = rec.anchor_path
        anchors[r, t:] = rec.anchor_path[-1] if t else 0
        lw = len(rec.window_codes)
        codes[r, :lw] = rec.window_codes
        ids[r, : len(m)] = kmer_ids(rec.window_codes, model.k)
        wstart[r] = rec.anchor.ref_start
        wlen[r] = lw
        strand[r] = rec.anchor.strand
        read_ids.append(rec.read_id)
        contigs.append(rec.anchor.contig)
    # padded rows: minimally alive so the DP is well-defined
    t_len[n:] = 1
    n_ref[n:] = 1

    contigs += [contigs[0] if contigs else ""] * (R - n)
    bands = build_chunked_bands(anchors, t_len, n_ref, cfg.band_width, cfg.signal_chunk)
    return Batch(
        x=x, t_len=t_len, mu=mu, sigma=sigma, n_ref=n_ref, bands=bands,
        codes=codes, ids=ids, window_start=wstart, window_len=wlen,
        strand=strand, read_ids=read_ids, contigs=contigs, n_reads=n,
    )


def device_backend() -> str:
    return jax.default_backend()


def path_to_segments(path: np.ndarray, t_len: int, n_ref: int):
    """Per-reference-position signal sample ranges from a Viterbi path.

    The path (window k-mer position per signal sample) is monotone
    nondecreasing, so each position's [start, end) range falls out of two
    bisections. Unvisited positions get (-1, -1). This is the reference's
    ``align`` output shape (SURVEY.md §2 "Output writers" row).
    """
    p = np.asarray(path[:t_len])
    pos = np.arange(n_ref)
    s = np.searchsorted(p, pos, side="left")
    e = np.searchsorted(p, pos, side="right")
    visited = e > s
    return np.where(visited, s, -1), np.where(visited, e, -1)


def device_compute(
    x, t_len, mu, sigma, n_ref, lo, delta, mu_b, sg_b, codes, ids,
    lm, ls, woff, ttab, tva,
    cfg: AlignConfig, backend: str, k: int, interpret: bool,
):
    """The per-device compute body shared by EVERY execution path.

    Single-chip (:func:`_device_step`) and multi-device
    (parallel/sharded.make_sharded_step) wrap this exact function, so the
    optimized kernels (Pallas fill with pregathered bands, Pallas rescore,
    genome subst tables) are what runs under shard_map too — the two
    programs cannot diverge. lo/delta are always chunked (R, n_chunks);
    the scan backend expands them here. Table args are None off the
    tables path. Returns (score, path (R, T) i32, base_ll (R, L, 4)).
    """
    if backend == "pallas":
        res, _ = pallas_dp.pallas_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo, delta, cfg,
            interpret=interpret, mu_band=mu_b, sg_band=sg_b,
        )
    else:
        T = x.shape[1]
        lo_full = jnp.repeat(lo, cfg.signal_chunk, axis=1)[:, :T]
        res = banded_dp.banded_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo_full, cfg)

    if cfg.snp_rescore == "local":
        if backend == "pallas":
            from .ops import pallas_rescore

            tkw = {}
            if ttab is not None:
                tkw = dict(tables_tab=ttab, tables_valid=tva,
                           window_off=woff)
            base_ll = pallas_rescore.base_loglik_local_pallas(
                x, res.path, t_len, codes, ids, lm, ls, k, cfg,
                t_w=cfg.snp_local_window, interpret=interpret, **tkw,
            )
        else:
            base_ll = banded_dp.base_loglik_local_batch(
                x, res.path, t_len, codes, ids, lm, ls, k, cfg,
                t_w=cfg.snp_local_window,
            )
    else:
        stats = banded_dp.segment_stats_batch(res.path, x, t_len, mu.shape[1])
        base_ll = banded_dp.base_loglik_batch(codes, ids, stats, lm, ls, k)
    return res.score, res.path, base_ll


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "backend", "k", "interpret"),
)
def _device_step(
    x, t_len, mu, sigma, n_ref, lo, delta, mu_b, sg_b, codes, ids,
    lm, ls, woff, ttab, tva,
    cfg: AlignConfig, backend: str, k: int, interpret: bool,
):
    """The whole per-batch device program as ONE jitted function.

    Dispatching the pipeline as individual eager ops measured ~3.4 s/batch
    through the axon tunnel (every op is a remote round trip); fused under
    one jit it is the same ~30 ms program bench.py runs.
    """
    return device_compute(
        x, t_len, mu, sigma, n_ref, lo, delta, mu_b, sg_b, codes, ids,
        lm, ls, woff, ttab, tva,
        cfg=cfg, backend=backend, k=k, interpret=interpret,
    )


def resolve_backend(cfg: AlignConfig, backend: str = "auto") -> str:
    if backend == "auto":
        backend = "pallas" if device_backend() == "tpu" else "scan"
    if backend not in ("pallas", "scan"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend


def stage_batch(batch: Batch, model: KmerModel, cfg: AlignConfig,
                backend: str, subst=None) -> dict:
    """Host prep + device upload of everything _device_step consumes.

    Safe to call from a prefetch thread (jax dispatch is thread-safe), so
    the host→device transfer of batch N+1 overlaps the device compute of
    batch N — on the axon tunnel the H2D hop is the CLI's main steady-state
    cost.
    """
    backend = resolve_backend(cfg, backend)
    # band levels are sliced ON DEVICE (ops/pallas_dp.band_gather_pallas):
    # the host numpy pregather took 0.17-0.33 s/batch on the 2-CPU host and
    # its result was ~23 MB of per-batch H2D — both dominated CLI steady
    # throughput (round-3 measurement)
    mu_b = sg_b = None
    lo = jnp.asarray(batch.bands.lo)
    delta = jnp.asarray(batch.bands.delta)

    woff = ttab = tva = None
    if subst is not None and backend == "pallas" and cfg.snp_rescore == "local":
        woff = jnp.asarray(subst.window_offsets(
            batch.contigs, batch.window_start, batch.window_len, batch.strand,
            padded_len=batch.codes.shape[1],
        ))
        ttab, tva = subst.tab4, subst.valid

    return dict(
        x=jnp.asarray(batch.x), t_len=jnp.asarray(batch.t_len),
        mu=jnp.asarray(batch.mu), sigma=jnp.asarray(batch.sigma),
        n_ref=jnp.asarray(batch.n_ref), lo=lo, delta=delta,
        mu_b=mu_b, sg_b=sg_b,
        codes=jnp.asarray(batch.codes), ids=jnp.asarray(batch.ids),
        lm=jnp.asarray(model.level_mean), ls=jnp.asarray(model.level_std),
        woff=woff, ttab=ttab, tva=tva,
        backend=backend, k=model.k,
    )


def align_batch(
    batch: Batch,
    model: KmerModel,
    cfg: AlignConfig,
    backend: str = "auto",
    interpret: bool = False,
    subst=None,  # ops.subst_tables.SubstTables — genome-level rescore tables
    staged: Optional[dict] = None,
):
    """Run the device part on one batch: DP + base log-likelihoods.

    backend: "auto" (pallas on TPU, scan otherwise), "pallas", "scan".
    Pass ``staged`` (from :func:`stage_batch`, e.g. computed in a prefetch
    thread) to skip the in-line host prep + upload. Returns dict of device
    arrays: score (R,), path (R, T), base_loglik (R, L, 4).
    """
    a = staged if staged is not None else stage_batch(
        batch, model, cfg, backend, subst=subst)
    backend = a["backend"]
    k = a["k"]
    score, path, base_ll = _device_step(
        a["x"], a["t_len"], a["mu"], a["sigma"], a["n_ref"], a["lo"],
        a["delta"], a["mu_b"], a["sg_b"], a["codes"], a["ids"], a["lm"],
        a["ls"], a["woff"], a["ttab"], a["tva"],
        cfg=cfg, backend=backend, k=k, interpret=interpret,
    )
    return {
        "score": score,
        "path": path,
        "base_loglik": base_ll,
    }
