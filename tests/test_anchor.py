"""Anchoring: seed index, strand/diagonal vote, signal anchor path."""

import numpy as np
import pytest

from nadavca_tpu.anchor import SeedIndex, anchor_basecall, signal_anchor_path
from nadavca_tpu.config import AlignConfig
from nadavca_tpu.genome import decode_bases
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import dp_spec


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(99)
    model = default_model()
    genome = random_genome(rng, length=5000)
    index = SeedIndex(genome)
    return rng, model, genome, index


@pytest.mark.parametrize("strand", [+1, -1])
def test_anchor_finds_window(setup, strand):
    rng, model, genome, index = setup
    read = simulate_read(genome, "ref", model, rng, read_len=400, start=1000,
                         strand=strand)
    a = anchor_basecall(index, read.basecall)
    assert a is not None
    assert a.contig == "ref"
    assert a.strand == strand
    # window must cover the true span with some slack
    assert a.ref_start <= 1000 + 25
    assert a.ref_end >= 1400 - 25


def test_anchor_rejects_garbage(setup):
    rng, model, genome, index = setup
    junk = decode_bases(rng.integers(0, 4, size=300).astype(np.int8))
    a = anchor_basecall(index, junk)
    # a random 300-mer should draw no coherent diagonal support
    assert a is None or a.score < 20


@pytest.mark.parametrize("strand", [+1, -1])
def test_signal_anchor_path_monotone(setup, strand):
    rng, model, genome, index = setup
    read = simulate_read(genome, "ref", model, rng, read_len=300, start=2000,
                         strand=strand)
    a = anchor_basecall(index, read.basecall)
    assert a.strand == strand
    path = signal_anchor_path(a, read.move_index, len(read.signal))
    assert len(path) == len(read.signal)
    assert (np.diff(path) >= 0).all()
    # anchor must track the true path (in the anchor window's coordinates):
    # fwd: window offset difference; rev: mirrored offset difference
    shift = read.ref_start - a.ref_start if strand > 0 else a.ref_end - read.ref_end
    err = np.abs(path - (read.true_path + shift))
    assert np.median(err) < 10, f"median anchor error {np.median(err)}"


def test_end_to_end_alignment_via_anchor(setup):
    """Full host pipeline: anchor from (errored) basecall, window from genome,
    banded DP recovers the simulated truth — anchor-insensitivity check."""
    rng, model, genome, index = setup
    read = simulate_read(genome, "ref", model, rng, read_len=350, start=3000,
                         strand=1, mean_dwell=9.0, noise_scale=0.7)
    a = anchor_basecall(index, read.basecall)
    window = genome.window(a.contig, a.ref_start, a.ref_end, a.strand)
    mu, sigma = model.expected_signal(window)
    anchor_path = signal_anchor_path(a, read.move_index, len(read.signal))
    cfg = AlignConfig(band_width=128)
    lo = dp_spec.make_band(anchor_path, len(mu), cfg.band_width)
    score, path = dp_spec.banded_viterbi(
        read.signal, mu.astype(np.float64), sigma.astype(np.float64), lo, cfg
    )
    # recovered path (in window coords) vs truth (in read-window coords):
    shift = read.ref_start - a.ref_start
    err = np.abs(path - (read.true_path + shift))
    assert np.mean(err <= 2) > 0.9, f"frac within 2: {np.mean(err <= 2)}"
