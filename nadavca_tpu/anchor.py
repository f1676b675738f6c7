"""Approximate read→reference anchoring (host side).

The reference anchors reads by running ``bwa`` on the basecalled sequence and
composing the SAM alignment with the basecaller's move table (SURVEY.md
"Approximate aligner" row, §3.1; reconstructed — reference mount empty). An
external aligner is an unwanted dependency here, so this module implements an
independent seed-and-vote anchorer (minimizer-free minimap-lite):

  1. index all seed k-mers (default 13) of the forward reference with a
     sort/searchsorted index (numpy, O(G log G) build, no Python dicts);
  2. for a basecall, look up seeds of the sequence and of its reverse
     complement, vote on (strand, diagonal) in a coarse diagonal histogram;
  3. the winning diagonal band gives contig window + strand; composing with
     the basecaller move table maps every raw signal sample to an approximate
     reference offset inside the window — the anchor path that seeds the DP
     band.

Parity note: anchor differences vs bwa shift the DP band only; SURVEY.md §7.3
item 4 prescribes band width generous enough to make the DP result
anchor-insensitive, which tests/test_anchor.py checks end-to-end.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .genome import Genome, encode_bases, kmer_ids, reverse_complement


@dataclasses.dataclass
class Anchor:
    """Result of anchoring one read."""

    contig: str
    strand: int           # +1 / -1
    ref_start: int        # genome coords of the aligned window
    ref_end: int
    # approximate window base offset for each basecall base (len = n_bases):
    base_to_window: np.ndarray
    score: int            # number of supporting seed votes


class SeedIndex:
    """Sorted-seed index of a genome (forward strands, all contigs)."""

    def __init__(self, genome: Genome, seed_k: int = 13):
        self.genome = genome
        self.seed_k = seed_k
        ids_list, pos_list, contig_ids = [], [], []
        self.contig_names: List[str] = []
        self.contig_lengths: List[int] = []
        for ci, contig in enumerate(genome):
            self.contig_names.append(contig.name)
            self.contig_lengths.append(len(contig))
            ids = kmer_ids(contig.codes, seed_k)
            keep = ids >= 0
            ids_list.append(ids[keep].astype(np.int64))
            pos_list.append(np.nonzero(keep)[0].astype(np.int64))
            contig_ids.append(np.full(keep.sum(), ci, dtype=np.int32))
        ids = np.concatenate(ids_list) if ids_list else np.empty(0, np.int64)
        order = np.argsort(ids, kind="stable")
        self.sorted_ids = ids[order]
        self.sorted_pos = np.concatenate(pos_list)[order] if len(order) else np.empty(0, np.int64)
        self.sorted_contig = np.concatenate(contig_ids)[order] if len(order) else np.empty(0, np.int32)

    def lookup(self, ids: np.ndarray):
        """For each query seed id: (hit_pos, hit_contig, query_idx) arrays."""
        valid = ids >= 0
        q_idx = np.nonzero(valid)[0]
        q = ids[q_idx]
        left = np.searchsorted(self.sorted_ids, q, side="left")
        right = np.searchsorted(self.sorted_ids, q, side="right")
        counts = right - left
        total = int(counts.sum())
        if total == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int32), np.empty(0, np.int64))
        out_q = np.repeat(q_idx, counts)
        # ranges [left_i, right_i) flattened
        starts = np.repeat(left, counts)
        offsets = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        flat = starts + offsets
        return self.sorted_pos[flat], self.sorted_contig[flat], out_q


def anchor_basecall(
    index: SeedIndex,
    basecall: str | np.ndarray,
    seed_stride: int = 3,
    diag_bin: int = 32,
    min_votes: int = 5,
    margin: int = 10,
    max_drift: Optional[int] = None,
) -> Optional[Anchor]:
    """Anchor a basecalled sequence: best (strand, contig, diagonal) by votes.

    The base→window map is a piecewise-linear fit through the seed chain
    (``np.interp`` over the winning hits), not a single rigid diagonal: real
    basecalls carry ~5–10% insertions/deletions, which make the true mapping
    drift away from any one diagonal by O(indel_rate · read_len) bases —
    enough to walk a long read out of the DP band. Hits within ``max_drift``
    (default ``max(2·diag_bin, 15% of read length)``) of the winning coarse
    diagonal are chained; the fit reduces exactly to the old ``base0 + i``
    diagonal when the basecall has no indels (all hits share one diagonal).
    The reference absorbs indels via a full bwa alignment (SURVEY.md §2
    "Approximate aligner"); this is the equivalent lightweight mechanism.
    """
    codes = encode_bases(basecall) if isinstance(basecall, (str, bytes)) else basecall
    k = index.seed_k
    n = len(codes) - k + 1
    if n <= 0:
        return None
    n_bases = len(codes)
    if max_drift is None:
        max_drift = max(2 * diag_bin, int(0.15 * n_bases))

    best = None        # (votes, strand, contig_idx, diag_center_bases)
    best_hits = None   # (pos, read_off) of hits near the winning diagonal
    for strand, c in ((+1, codes), (-1, reverse_complement(codes))):
        ids = kmer_ids(c, k)
        sub = ids[::seed_stride]
        q_offsets = np.arange(0, len(ids), seed_stride)
        pos, contig, qi = index.lookup(sub)
        if len(pos) == 0:
            continue
        read_off = q_offsets[qi]
        diag = (pos - read_off) // diag_bin
        # vote per (contig, diag)
        key = contig.astype(np.int64) * (1 << 40) + (diag + (1 << 30))
        uniq, counts = np.unique(key, return_counts=True)
        # merge adjacent diagonal bins for robustness
        top = np.argmax(counts)
        votes = int(counts[top])
        for nb in (uniq[top] - 1, uniq[top] + 1):
            j = np.searchsorted(uniq, nb)
            if j < len(uniq) and uniq[j] == nb:
                votes += int(counts[j])
        if best is None or votes > best[0]:
            ci = int(uniq[top] >> 40)
            dg = int((uniq[top] & ((1 << 40) - 1)) - (1 << 30))
            d0 = dg * diag_bin + diag_bin // 2
            on = (contig == ci) & (np.abs((pos - read_off) - d0)
                                   <= max_drift + diag_bin)
            best = (votes, strand, ci, d0)
            best_hits = (pos[on], read_off[on])

    if best is None or best[0] < min_votes:
        return None
    votes, strand, ci, d0 = best
    pos_h, off_h = best_hits
    # second, tighter outlier pass around the hit population's own median
    c_h = pos_h - off_h  # genome-diagonal of each hit
    med = float(np.median(c_h))
    keep = np.abs(c_h - med) <= max_drift
    pos_h, off_h = pos_h[keep], off_h[keep]
    clen = index.contig_lengths[ci]
    # window span: extrapolate the read's full extent from every kept hit
    start = int(max(0, (pos_h - off_h).min() - margin))
    end = int(min(clen, (pos_h + (n_bases - off_h)).max() + margin))
    # Anchor points in read coordinates. A hit (o, p) means k-mer o of the
    # strand-oriented sequence matches genome[p:p+k]. Forward: read base
    # i = o sits at window offset m = p − start. Reverse: the window is the
    # revcomp of genome[start:end) and the hit is on the revcomp'd read
    # (rc_read[o+j] == genome[p+j]); unwinding both complements, read base
    # i = n_bases−1−o sits at m = (end − p − n_bases + o) + i (derivation in
    # tests/test_anchor.py).
    if strand > 0:
        i_pts = off_h.astype(np.float64)
        m_pts = (pos_h - start).astype(np.float64)
    else:
        i_pts = (n_bases - 1 - off_h).astype(np.float64)
        m_pts = (end - pos_h - n_bases + off_h) + i_pts
    order = np.argsort(i_pts, kind="stable")
    i_pts, m_pts = i_pts[order], m_pts[order]
    i_pts, first_idx = np.unique(i_pts, return_index=True)
    c_pts = (m_pts - i_pts)[first_idx]  # window-diagonal offset per anchor point
    # piecewise-linear drift between anchor points; constant (slope-1 map)
    # beyond the first/last seed; cummax guards residual non-monotonicity
    i_all = np.arange(n_bases, dtype=np.float64)
    base_to_window = np.interp(i_all, i_pts, c_pts) + i_all
    base_to_window = np.maximum.accumulate(base_to_window)
    base_to_window = np.clip(base_to_window, 0, max(end - start - 1, 0))
    return Anchor(
        contig=index.contig_names[ci],
        strand=strand,
        ref_start=start,
        ref_end=end,
        base_to_window=base_to_window,
        score=votes,
    )


def signal_anchor_path(
    anchor: Anchor, move_index: np.ndarray, n_samples: int
) -> np.ndarray:
    """Approximate window k-mer position for every raw signal sample.

    move_index[i] = first signal sample of basecall base i (from the
    basecaller's move table; SURVEY.md §3.1 composes exactly these two maps).
    Returns (n_samples,) float64 anchor path, monotone nondecreasing.
    """
    starts = np.asarray(move_index, dtype=np.int64)
    # base index for each sample: rightmost base whose start <= t
    t = np.arange(n_samples)
    base_of_t = np.searchsorted(starts, t, side="right") - 1
    base_of_t = np.clip(base_of_t, 0, len(starts) - 1)
    path = anchor.base_to_window[base_of_t]
    return np.maximum.accumulate(path)
