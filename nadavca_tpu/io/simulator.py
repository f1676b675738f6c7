"""Squiggle simulator: generates raw-signal reads with known ground truth.

The sandbox has no nanopore test data (the reference mount is empty — see
SURVEY.md header), so the parity fixtures prescribed by SURVEY.md §4 are
generated here: given a reference window and a pore model, sample per-position
dwell times and Gaussian noise to produce a signal whose true alignment path is
known. Deterministic under a seed; also used to fabricate fast5 files for the
ingest tests (io/fast5.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..genome import decode_bases
from ..kmer_model import KmerModel


@dataclasses.dataclass
class SimulatedRead:
    read_id: str
    signal: np.ndarray          # (T,) float64 normalized-scale samples
    true_path: np.ndarray       # (T,) int64 reference k-mer position per sample
    window_codes: np.ndarray    # (L,) int8 encoded window bases (read direction)
    contig: str
    ref_start: int              # genome coords of the window
    ref_end: int
    strand: int                 # +1 / -1
    basecall: str               # basecalled sequence (window bases, possibly with errors)
    move_index: np.ndarray      # (len(basecall),) int64: signal sample where each base starts


def simulate_squiggle(
    window_codes: np.ndarray,
    model: KmerModel,
    rng: np.random.Generator,
    mean_dwell: float = 10.0,
    noise_scale: float = 1.0,
    skip_prob: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample (signal, true_path) for an encoded window.

    Dwell time per k-mer position is geometric with the given mean (min 1
    sample); samples are N(mu_p, sigma_p * noise_scale). With ``skip_prob``,
    a position emits zero samples (a pore "skip" event — the motor steps two
    bases between samples), so the true path advances by 2 there; consecutive
    skips are suppressed so the path is representable by the DP's max
    advance-by-2 transition (SURVEY.md §3.4 skip transition).
    """
    mu, sigma = model.expected_signal(window_codes)
    n = len(mu)
    p = 1.0 / mean_dwell
    dwells = rng.geometric(p, size=n)
    if skip_prob > 0.0 and n > 2:
        sk = rng.random(n) < skip_prob
        sk[0] = sk[-1] = False
        for i in range(1, n):
            if sk[i] and sk[i - 1]:
                sk[i] = False
        dwells[sk] = 0
    path = np.repeat(np.arange(n, dtype=np.int64), dwells)
    signal = rng.normal(mu[path], sigma[path] * noise_scale)
    return signal.astype(np.float64), path


def add_basecall_errors(
    codes: np.ndarray, rng: np.random.Generator, sub_rate: float = 0.02
) -> np.ndarray:
    """Apply substitution errors to an encoded sequence (simulated basecall)."""
    out = codes.copy()
    errs = rng.random(len(codes)) < sub_rate
    out[errs] = (out[errs] + rng.integers(1, 4, size=errs.sum())) % 4
    return out


def corrupt_basecall(
    codes: np.ndarray,
    move_index: np.ndarray,
    rng: np.random.Generator,
    sub_rate: float = 0.02,
    ins_rate: float = 0.0,
    del_rate: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Apply substitution + insertion + deletion errors to a basecall.

    Real basecalls carry ~5–10% indels, which the rigid no-indel corruption
    (:func:`add_basecall_errors`) cannot model; the indel-tolerant anchorer
    (anchor.py piecewise-linear seed-chain fit) is tested against this.
    Returns (codes', move_index'): a deleted base drops its move entry; an
    inserted base is a uniform random base inheriting the signal sample of
    the base it follows (so the basecall↔signal composition stays monotone,
    matching real basecaller move-table semantics).
    """
    if ins_rate <= 0.0 and del_rate <= 0.0:
        return add_basecall_errors(codes, rng, sub_rate), move_index.copy()
    out_c: list = []
    out_m: list = []
    for i, c in enumerate(codes):
        if rng.random() < del_rate:
            continue
        b = int(c)
        if rng.random() < sub_rate:
            b = (b + int(rng.integers(1, 4))) % 4
        out_c.append(b)
        out_m.append(move_index[i])
        while rng.random() < ins_rate:
            out_c.append(int(rng.integers(0, 4)))
            out_m.append(move_index[i])
    if not out_c:  # pathological rates: keep one base so downstream holds
        out_c, out_m = [int(codes[0])], [move_index[0]]
    return np.asarray(out_c, np.int8), np.asarray(out_m, np.int64)


def simulate_read(
    genome,
    contig: str,
    model: KmerModel,
    rng: np.random.Generator,
    read_len: int = 500,
    start: Optional[int] = None,
    strand: Optional[int] = None,
    mean_dwell: float = 10.0,
    noise_scale: float = 1.0,
    basecall_sub_rate: float = 0.02,
    read_id: Optional[str] = None,
    skip_prob: float = 0.0,
    basecall_ins_rate: float = 0.0,
    basecall_del_rate: float = 0.0,
) -> SimulatedRead:
    """Simulate a full read: window choice, squiggle, noisy basecall, move table."""
    ref = genome[contig]
    L = min(read_len, len(ref))
    if start is None:
        start = int(rng.integers(0, len(ref) - L + 1))
    if strand is None:
        strand = 1 if rng.random() < 0.5 else -1
    window = genome.window(contig, start, start + L, strand)
    signal, path = simulate_squiggle(window, model, rng, mean_dwell, noise_scale,
                                     skip_prob=skip_prob)

    # move table: sample index at which each base's kmer position begins.
    # kmer position p starts at the first t with path[t] == p; base index i is
    # approximated by kmer start position (standard basecaller convention).
    n_kmer = len(window) - model.k + 1
    first_t = np.full(len(window), -1, dtype=np.int64)
    seen = np.zeros(n_kmer, dtype=bool)
    for t, p_ in enumerate(path):
        if not seen[p_]:
            first_t[p_] = t
            seen[p_] = True
    # bases beyond the last kmer start (and skipped positions) inherit the
    # previous base's sample index
    for i in range(len(window)):
        if first_t[i] < 0:
            first_t[i] = first_t[i - 1] if i > 0 else 0
    basecall_codes, move = corrupt_basecall(
        window, first_t, rng, basecall_sub_rate,
        basecall_ins_rate, basecall_del_rate,
    )
    rid = read_id or f"sim_{contig}_{start}_{'+' if strand > 0 else '-'}_{rng.integers(1 << 30)}"
    return SimulatedRead(
        read_id=rid,
        signal=signal,
        true_path=path,
        window_codes=window,
        contig=contig,
        ref_start=start,
        ref_end=start + L,
        strand=strand,
        basecall=decode_bases(basecall_codes),
        move_index=move,
    )


def random_genome(rng: np.random.Generator, length: int = 5000, name: str = "ref"):
    """A random reference genome (single contig) for tests/benchmarks."""
    from ..genome import Genome

    codes = rng.integers(0, 4, size=length).astype(np.int8)
    return Genome.from_dict({name: decode_bases(codes)})
