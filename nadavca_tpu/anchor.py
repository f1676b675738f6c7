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
) -> Optional[Anchor]:
    """Anchor a basecalled sequence: best (strand, contig, diagonal) by votes."""
    codes = encode_bases(basecall) if isinstance(basecall, (str, bytes)) else basecall
    k = index.seed_k
    n = len(codes) - k + 1
    if n <= 0:
        return None

    best = None  # (votes, strand, contig, diag_center)
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
            # window span from the hits on the winning diagonal (±1 bin)
            on = (contig == ci) & (np.abs(diag - dg) <= 1)
            lo_pos = int(pos[on].min())
            hi_pos = int(pos[on].max()) + k
            first_off = int(read_off[on].min())
            last_off = int(read_off[on].max())
            best = (votes, strand, ci, lo_pos, hi_pos, first_off, last_off)

    if best is None or best[0] < min_votes:
        return None
    votes, strand, ci, lo_pos, hi_pos, first_off, last_off = best
    clen = index.contig_lengths[ci]
    n_bases = len(codes)
    # extend window to cover the whole read plus margin
    start = max(0, lo_pos - first_off - margin)
    end = min(clen, hi_pos + (n_bases - last_off - k) + margin)
    # window coordinate of read base i is base0 + i. Forward: seed hit
    # (o=first_off, p=lo_pos) gives read[o] ~ window[p - start], so
    # base0 = (lo_pos - start) - first_off. Reverse: the window is the
    # revcomp of genome[start:end], and the seed hit is on the revcomp'd
    # read, rc_read[o+j] == genome[p+j]; unwinding both complements gives
    # read[i] ~ window[(end - p - n + o) + i], i.e.
    # base0 = end - lo_pos - n + first_off (derivation in tests/test_anchor).
    if strand > 0:
        base0 = (lo_pos - start) - first_off
    else:
        base0 = (end - lo_pos - n_bases) + first_off
    base_to_window = base0 + np.arange(n_bases, dtype=np.float64)
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
