"""Indel-robust anchoring (VERDICT round-1 item 3; SURVEY.md §2 "Approximate
aligner", §7.3 item 4).

Real basecalls carry ~5–10% insertions/deletions; the reference absorbs them
through a full bwa alignment. Our anchorer must do the same with its
piecewise-linear seed-chain fit: on 5%-indel basecalls, anchor recovery must
stay ≥95% and the anchor path must stay within the DP band of the truth, and
end-to-end SNP recall must be unchanged.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nadavca_tpu import call
from nadavca_tpu.anchor import SeedIndex, anchor_basecall, signal_anchor_path
from nadavca_tpu.config import AlignConfig
from nadavca_tpu.genome import Genome, decode_bases
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.pipeline import assemble_batch, align_batch, preprocess_read

CFG = AlignConfig()
INDEL = dict(basecall_sub_rate=0.02, basecall_ins_rate=0.025,
             basecall_del_rate=0.025)  # ≈5% indels + 2% subs


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(314)
    model = default_model()
    genome = random_genome(rng, length=8000)
    index = SeedIndex(genome)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=600,
                      strand=1 if i % 2 else -1, mean_dwell=9.0,
                      noise_scale=0.8, **INDEL)
        for i in range(40)
    ]
    return rng, model, genome, index, reads


def test_anchor_recovery_rate_with_indels(world):
    rng, model, genome, index, reads = world
    ok = 0
    for rd in reads:
        a = anchor_basecall(index, rd.basecall)
        if (a is not None and a.contig == rd.contig and a.strand == rd.strand
                and a.ref_start <= rd.ref_start + 40
                and a.ref_end >= rd.ref_end - 40):
            ok += 1
    rate = ok / len(reads)
    assert rate >= 0.95, f"anchor recovery {rate:.2f} on 5%-indel basecalls"


def test_anchor_path_stays_inside_band_with_indels(world):
    """The anchor path must track the true path to within half the default
    band width for (almost) every sample — the rigid-diagonal map fails this
    because indel drift walks the band away from the truth."""
    rng, model, genome, index, reads = world
    B = CFG.band_width
    checked = 0
    for rd in reads:
        a = anchor_basecall(index, rd.basecall)
        if a is None or a.strand != rd.strand:
            continue
        path = signal_anchor_path(a, rd.move_index, len(rd.signal))
        shift = (rd.ref_start - a.ref_start if rd.strand > 0
                 else a.ref_end - rd.ref_end)
        err = np.abs(path - (rd.true_path + shift))
        frac_in_band = np.mean(err <= B // 2 - 8)  # margin for band clipping
        assert frac_in_band > 0.98, (
            f"{rd.read_id}: only {frac_in_band:.3f} of samples within band "
            f"(max err {err.max():.0f})")
        checked += 1
    assert checked >= 35


def test_e2e_snp_recall_unchanged_with_indels():
    """Same harness as test_pipeline_e2e but with 5%-indel basecalls: planted
    SNPs must still be called wherever covered."""
    rng = np.random.default_rng(2025)
    model = default_model()
    true_genome = random_genome(rng, length=3000)
    ref_codes = true_genome["ref"].codes.copy()
    truth = {}
    for p in (1000, 2000):
        orig = int(ref_codes[p])
        ref_codes[p] = (orig + 1) % 4
        truth[p] = orig
    ref_genome = Genome.from_dict({"ref": decode_bases(ref_codes)})
    index = SeedIndex(ref_genome)
    reads = [
        simulate_read(true_genome, "ref", model, rng, read_len=600,
                      start=rng.integers(0, 2400), strand=1 if i % 2 else -1,
                      mean_dwell=9.0, noise_scale=0.8, **INDEL)
        for i in range(12)
    ]
    records = []
    for rd in reads:
        rec = preprocess_read(rd.signal.astype(np.float32), rd.basecall,
                              rd.move_index, index, ref_genome, rd.read_id)
        if rec is not None:
            records.append(rec)
    assert len(records) >= 11, f"anchoring lost reads on indel basecalls: {len(records)}"

    batch = assemble_batch(records, model, CFG)
    out = align_batch(batch, model, CFG, backend="scan")
    G = len(ref_genome["ref"])
    acc, cov = call.make_accumulators(G)
    acc, cov = call.accumulate_batch(
        acc, cov, out["base_loglik"],
        jnp.asarray(batch.window_start), jnp.asarray(batch.window_len),
        jnp.asarray(batch.strand),
    )
    calls = call.call_snps(
        np.asarray(acc), np.asarray(cov), ref_genome["ref"].codes, "ref", CFG,
        min_coverage=2,
    )
    called = {c.position: c.alt_base for c in calls}
    for p, orig in truth.items():
        if np.asarray(cov)[p] >= 2:
            assert p in called, f"missed SNP at {p} (cov={np.asarray(cov)[p]})"
            assert called[p] == "ACGT"[orig]
    fps = [p for p in called if p not in truth]
    assert len(fps) <= 2, f"too many false positives: {fps}"


def test_long_read_systematic_drift(world):
    """A 4 kb read with asymmetric indel rates (3.5% ins / 1.5% del) drifts
    ~80 bases off any single diagonal — more than half the default band. The
    rigid base0+i map provably walks out of the band here; the piecewise fit
    must absorb it."""
    rng, model, genome, index, _ = world
    B = CFG.band_width
    for strand in (+1, -1):
        rd = simulate_read(genome, "ref", model, rng, read_len=4000, start=2000,
                           strand=strand, mean_dwell=6.0, noise_scale=0.8,
                           basecall_sub_rate=0.02, basecall_ins_rate=0.035,
                           basecall_del_rate=0.015)
        a = anchor_basecall(index, rd.basecall)
        assert a is not None and a.strand == strand
        # the fit must be materially non-rigid: the drift it models exceeds
        # what any one diagonal allows
        drift_span = np.ptp(a.base_to_window - np.arange(len(a.base_to_window)))
        assert drift_span > 40, f"fit is near-rigid (span {drift_span:.0f})"
        path = signal_anchor_path(a, rd.move_index, len(rd.signal))
        shift = (rd.ref_start - a.ref_start if strand > 0
                 else a.ref_end - rd.ref_end)
        err = np.abs(path - (rd.true_path + shift))
        frac = np.mean(err <= B // 2 - 8)
        assert frac > 0.98, f"strand {strand}: {frac:.3f} in band, max {err.max():.0f}"


def test_no_indel_anchor_unchanged(world):
    """With a clean basecall, the piecewise-linear fit must reduce to the old
    rigid diagonal: base_to_window == base0 + arange (slope exactly 1)."""
    rng, model, genome, index, _ = world
    rd = simulate_read(genome, "ref", model, rng, read_len=400, start=3000,
                       strand=1, basecall_sub_rate=0.0)
    a = anchor_basecall(index, rd.basecall)
    assert a is not None and a.strand == 1
    d = np.diff(a.base_to_window)
    np.testing.assert_allclose(d, 1.0)
