"""Joint adjacent-hypothesis rescoring of SNP candidate clusters.

The per-position caller scores each substitution hypothesis against its own
local signal window under the segmentation of the REFERENCE alignment. A true
SNP perturbs k consecutive k-mers, distorts the local segmentation, and can
make a NEIGHBOR position's alt hypothesis the apparent winner — the
adjacent-shift ambiguity (BASELINE.md accuracy notes; the f64 oracle makes
the identical shifted call, so this is a model limitation, not a kernel bug).

The fix (VERDICT r3 task 2, SURVEY.md §3.4 SNP re-score row) is a second,
JOINT pass over each candidate cluster:

  * hypothesis set = {reference} ∪ {base b at position p : p within k-1 of a
    candidate hit, b != ref_p} — every way a single SNP near the cluster
    could explain the evidence;
  * every covering read contributes the SAME signal slice to every
    hypothesis, and each hypothesis is scored by full re-ALIGNMENT (a fresh
    banded Viterbi over the slice with hypothesis-substituted expected
    levels) — the segmentation adapts to the hypothesis instead of being
    pinned to the reference alignment, and scores are comparable across
    positions;
  * total log-likelihoods sum across reads; the argmax hypothesis wins. A
    non-reference winner must beat the reference hypothesis by
    cfg.snp_joint_margin to be emitted.

Candidate clusters are rare (they already passed the caller's filters), so
the pass costs one tiny batched DP — reads × hypotheses rows of a few
hundred samples — via the portable lax.scan backend (ops/banded_dp.py).

Staged so multi-host works shared-nothing: :func:`cluster_plan` is a pure
function of the (globally merged, replicated) accumulators — every process
derives the identical plan; :func:`partial_totals` scores only the LOCAL
shard's covering reads; the flat (totals, counts) vectors sum across
processes (allgather + sum); :func:`decide` turns summed totals into calls.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from . import call as callmod
from .config import AlignConfig
from .kmer_model import KmerModel

# static DP shapes for the joint pass: one compiled executable regardless of
# cluster geometry. T_PAD bounds the signal slice (slices are ~dwell × slice
# positions ≈ 300-500 samples; longer tails are trimmed symmetrically).
T_PAD = 512
N_PAD = 64

_COMP = np.array([3, 2, 1, 0], dtype=np.int64)
_BASES = "ACGT"


@dataclasses.dataclass(frozen=True)
class ReadMeta:
    """Per-read placement metadata retained by the streaming SNP loop.

    ~60 bytes/read — enough to find the reads covering a candidate cluster
    after the full records have been streamed away, so the joint pass can
    re-ingest exactly those reads (io lazy-skip makes that cheap)."""

    read_id: str
    contig: str
    wstart: int
    wlen: int
    strand: int


@dataclasses.dataclass(frozen=True)
class Cluster:
    """One candidate cluster: hit span + its hypothesis enumeration."""

    span: Tuple[int, int]                 # inclusive genome-position span
    hyps: Tuple[Tuple[int, int], ...]     # (position, alt base) per hypothesis
    fallback_pos: int                     # strongest hit (no-evidence fallback)
    fallback_base: int
    fallback_prob: float


def group_clusters(hits: np.ndarray, k: int) -> List[Tuple[int, int]]:
    """Group sorted hit positions into spans with gaps < k.

    Hypotheses cover every position within k-1 of the span, which is where a
    single true SNP can sit and still perturb the hit positions' k-mers."""
    if len(hits) == 0:
        return []
    hits = np.sort(np.asarray(hits))
    spans = []
    lo = hi = int(hits[0])
    for h in hits[1:]:
        if int(h) - hi < int(k):
            hi = int(h)
        else:
            spans.append((lo, hi))
            lo = hi = int(h)
    spans.append((lo, hi))
    return spans


def reads_covering(span: Tuple[int, int], metas: Iterable[ReadMeta],
                   k: int) -> List[ReadMeta]:
    """Reads whose window fully covers the hypothesis-affected positions."""
    gl = span[0] - (k - 1)
    gh = span[1] + (k - 1)
    return [m for m in metas if m.wstart <= gl and gh < m.wstart + m.wlen]


def cluster_plan(
    acc: np.ndarray,
    cov: np.ndarray,
    votes: Optional[np.ndarray],
    ref_codes: np.ndarray,
    cfg: AlignConfig,
    min_coverage: int = 1,
) -> List[Cluster]:
    """Deterministic cluster + hypothesis enumeration from the accumulators.

    A pure function of globally-merged state, so every process of a
    multi-host run derives the identical plan independently."""
    hit, best, pbest = callmod.candidate_hits(
        acc, cov, ref_codes, cfg, min_coverage=min_coverage, votes=votes)
    hits = np.nonzero(hit)[0]
    plan = []
    acc = np.asarray(acc)
    for span in group_clusters(hits, cfg.k):
        g0 = max(span[0] - (cfg.k - 1), 0)
        g1 = min(span[1] + (cfg.k - 1), len(ref_codes) - 1)
        hyps = []
        for p in range(g0, g1 + 1):
            rp = int(ref_codes[p])
            if rp > 3:
                continue
            for b in range(4):
                if b != rp:
                    hyps.append((p, b))
        span_hits = [int(g) for g in hits if span[0] <= g <= span[1]]
        fb = max(span_hits,
                 key=lambda g: float(acc[g].max() - acc[g, ref_codes[g]]))
        plan.append(Cluster(span=span, hyps=tuple(hyps), fallback_pos=fb,
                            fallback_base=int(best[fb]),
                            fallback_prob=float(pbest[fb])))
    return plan


def _read_rows(rec, span, hyps, model: KmerModel, cfg: AlignConfig):
    """Per-read DP rows: one signal slice × (1 + len(hyps)) level sets.

    Returns (x_slice, mu_rows, sg_rows) or None when the read's anchor does
    not place enough signal on the cluster. Coordinates: the read's window
    is genome[wstart : wstart+wlen] (reverse-complemented when strand < 0),
    rec.anchor_path[t] is the window K-MER position of sample t (monotone).
    """
    k = model.k
    a = rec.anchor
    wlen = len(rec.window_codes)
    # genome span of interest (hypothesis positions ± context pad)
    gl = span[0] - (k - 1) - cfg.snp_joint_pad
    gh = span[1] + (k - 1) + cfg.snp_joint_pad

    def to_window(g):
        if a.strand > 0:
            return g - a.ref_start
        return (a.ref_start + wlen - 1) - g

    wa, wb = to_window(gl), to_window(gh)
    w0 = max(min(wa, wb), 0)
    w1 = min(max(wa, wb) + 1, wlen)           # window BASE positions [w0, w1)
    n_pos = w1 - w0 - k + 1                    # k-mer positions in the slice
    if n_pos < 2 or n_pos > N_PAD:
        return None

    # sample range: the anchor maps window k-mer positions to samples; pad by
    # half the band width each side (the anchor may be off by up to the band)
    path = rec.anchor_path[: len(rec.signal)]
    s0 = int(np.searchsorted(path, w0, side="left"))
    s1 = int(np.searchsorted(path, w1 - k, side="right"))
    s0 = max(s0 - cfg.band_width // 2, 0)
    s1 = min(s1 + cfg.band_width // 2, len(rec.signal))
    if s1 - s0 < 4 * k:
        return None
    if s1 - s0 > T_PAD:                        # trim symmetrically
        extra = (s1 - s0) - T_PAD
        s0 += extra // 2
        s1 = s0 + T_PAD
    x = rec.signal[s0:s1]

    codes = np.asarray(rec.window_codes[w0:w1], np.int64)
    mu_rows, sg_rows = [], []
    for hyp in [None] + list(hyps):
        c = codes
        if hyp is not None:
            p, b = hyp
            wp = to_window(p) - w0
            if not 0 <= wp < len(c):
                return None
            c = codes.copy()
            # the window stores the revcomp for reverse-strand reads, so a
            # genome-forward alt lands as its complement
            c[wp] = b if a.strand > 0 else int(_COMP[b])
        m, s = model.expected_signal(c)
        mu_rows.append(m)
        sg_rows.append(s)
    return x, np.stack(mu_rows), np.stack(sg_rows)


def _score_rows(xs, t_lens, mus, sgs, n_refs, cfg: AlignConfig) -> np.ndarray:
    """Batched full-band Viterbi scores over the padded joint rows.

    Runs the portable lax.scan backend on the host CPU device — the batch is
    tiny (reads × hypotheses rows of ≤ T_PAD samples) and a remote-TPU
    compile round trip would cost more than the whole pass."""
    import jax
    import jax.numpy as jnp

    from .ops import banded_dp

    jcfg = dataclasses.replace(cfg, band_width=128, band_width_long=128)
    R = len(xs)
    x = np.zeros((R, T_PAD), np.float32)
    mu = np.zeros((R, N_PAD), np.float32)
    sg = np.ones((R, N_PAD), np.float32)
    for r in range(R):
        x[r, : len(xs[r])] = xs[r]
        mu[r, : len(mus[r])] = mus[r]
        sg[r, : len(sgs[r])] = sgs[r]
    lo = np.zeros((R, T_PAD), np.int32)        # full band: anchor-insensitive
    try:
        dev = jax.devices("cpu")[0]
        ctx = jax.default_device(dev)
    except RuntimeError:
        ctx = _nullctx()
    with ctx:
        # pinned endpoints: with free ends a whole-slice shift is nearly
        # free and adjacent hypotheses tie — the ambiguity would re-enter
        # through the gauge freedom of the alignment itself
        res = banded_dp.banded_viterbi_batch(
            jnp.asarray(x), jnp.asarray(np.asarray(t_lens, np.int32)),
            jnp.asarray(mu), jnp.asarray(sg),
            jnp.asarray(np.asarray(n_refs, np.int32)), jnp.asarray(lo), jcfg,
            pin_start=True, pin_end=True)
        return np.asarray(res.score)


class _nullctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def partial_totals(
    plan: Sequence[Cluster],
    metas: Sequence[ReadMeta],
    records_by_id: Dict[str, object],
    model: KmerModel,
    cfg: AlignConfig,
) -> Tuple[List[np.ndarray], List[int]]:
    """This shard's contribution: summed hypothesis scores + read counts.

    totals[c] is a (1 + n_hyps,) float64 vector (reference hypothesis
    first); counts[c] the number of local reads that contributed. Both sum
    elementwise across processes."""
    totals = [np.zeros(1 + len(c.hyps), np.float64) for c in plan]
    counts = [0 for _ in plan]
    rows_x, rows_mu, rows_sg, rows_key = [], [], [], []
    for ci, c in enumerate(plan):
        for m in reads_covering(c.span, metas, cfg.k):
            rec = records_by_id.get(m.read_id)
            if rec is None:
                continue
            rr = _read_rows(rec, c.span, c.hyps, model, cfg)
            if rr is None:
                continue
            x, mu_r, sg_r = rr
            counts[ci] += 1
            for h in range(1 + len(c.hyps)):
                rows_x.append(x)
                rows_mu.append(mu_r[h])
                rows_sg.append(sg_r[h])
                rows_key.append((ci, h))
    if rows_x:
        scores = _score_rows(
            rows_x, [len(v) for v in rows_x], rows_mu, rows_sg,
            [len(v) for v in rows_mu], cfg)
        for (ci, h), s in zip(rows_key, scores):
            totals[ci][h] += float(s)
    return totals, counts


def decide(
    plan: Sequence[Cluster],
    totals: Sequence[np.ndarray],
    counts: Sequence[int],
    cov: np.ndarray,
    ref_codes: np.ndarray,
    contig: str,
    cfg: AlignConfig,
) -> List[callmod.SnpCall]:
    """Summed hypothesis totals → final calls for one contig."""
    calls: List[callmod.SnpCall] = []
    cov = np.asarray(cov)
    for c, total, n in zip(plan, totals, counts):
        if n == 0 or not c.hyps:
            # no re-alignable evidence anywhere: keep the per-position
            # caller's strongest hit for this cluster
            calls.append(callmod.SnpCall(
                contig=contig, position=c.fallback_pos,
                ref_base=_BASES[int(ref_codes[c.fallback_pos])],
                alt_base=_BASES[c.fallback_base],
                probability=c.fallback_prob,
                coverage=int(cov[c.fallback_pos])))
            continue
        ref_total = float(total[0])
        alt_idx = int(np.argmax(total[1:]))
        p_star, b_star = c.hyps[alt_idx]
        edge = float(total[1 + alt_idx]) - ref_total
        if edge < cfg.snp_joint_margin:
            continue                             # reference explains it best
        # posterior over the hypothesis set (uniform prior)
        t = np.asarray(total) - np.max(total)
        prob = float(np.exp(t[1 + alt_idx]) / np.exp(t).sum())
        calls.append(callmod.SnpCall(
            contig=contig, position=int(p_star),
            ref_base=_BASES[int(ref_codes[p_star])], alt_base=_BASES[b_star],
            probability=prob, coverage=int(cov[p_star])))
    return calls


def needed_read_ids(plan: Sequence[Cluster], metas: Sequence[ReadMeta],
                    k: int) -> set:
    """Read ids this shard must re-load for the plan (one re-ingest pass)."""
    needed = set()
    for c in plan:
        for m in reads_covering(c.span, metas, k):
            needed.add(m.read_id)
    return needed


def refine_contig_calls(
    acc: np.ndarray,
    cov: np.ndarray,
    votes: Optional[np.ndarray],
    ref_codes: np.ndarray,
    contig: str,
    cfg: AlignConfig,
    model: KmerModel,
    metas: Sequence[ReadMeta],
    records_by_id: Dict[str, object],
    min_coverage: int = 1,
) -> List[callmod.SnpCall]:
    """Single-process convenience wrapper: plan → score local → decide."""
    plan = cluster_plan(acc, cov, votes, ref_codes, cfg,
                        min_coverage=min_coverage)
    if not plan:
        return []
    totals, counts = partial_totals(plan, metas, records_by_id, model, cfg)
    return decide(plan, totals, counts, cov, ref_codes, contig, cfg)
