"""End-to-end: simulate reads with a planted SNP → anchored batches → banded
DP → base likelihoods → genome accumulation → SNP calls.

This is the config-1 shape of BASELINE.json (single small read set vs a small
reference) run through the real pipeline, with the simulator as ground truth
(SURVEY.md §7.3 item 7: the spec/simulator is the interim oracle because the
reference mount is empty).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nadavca_tpu import call
from nadavca_tpu.anchor import SeedIndex
from nadavca_tpu.config import AlignConfig
from nadavca_tpu.genome import Genome, decode_bases
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.pipeline import assemble_batch, align_batch, preprocess_read

CFG = AlignConfig()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(2024)
    model = default_model()
    # "true" sample genome and a reference that differs by 2 SNPs
    true_genome = random_genome(rng, length=3000)
    ref_codes = true_genome["ref"].codes.copy()
    snp_positions = [1000, 2000]
    truth = {}
    for p in snp_positions:
        orig = int(ref_codes[p])
        ref_codes[p] = (orig + 1) % 4  # reference differs from sample
        truth[p] = orig
    ref_genome = Genome.from_dict({"ref": decode_bases(ref_codes)})
    index = SeedIndex(ref_genome)

    # reads simulated from the TRUE genome at moderate noise, both strands
    reads = [
        simulate_read(true_genome, "ref", model, rng, read_len=600,
                      start=rng.integers(0, 2400), strand=1 if i % 2 else -1,
                      mean_dwell=9.0, noise_scale=0.8)
        for i in range(12)
    ]
    return model, true_genome, ref_genome, index, reads, truth


def test_e2e_snp_calls(world):
    model, true_genome, ref_genome, index, reads, truth = world
    records = []
    for rd in reads:
        rec = preprocess_read(rd.signal.astype(np.float32), rd.basecall,
                              rd.move_index, index, ref_genome, rd.read_id)
        if rec is not None:
            records.append(rec)
    assert len(records) >= 10, f"anchoring lost too many reads: {len(records)}"

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
        # the planted SNP must be called with the sample's true base —
        # unless no read covers it (the random starts could miss it)
        if np.asarray(cov)[p] >= 2:
            assert p in called, f"missed SNP at {p} (cov={np.asarray(cov)[p]})"
            assert called[p] == "ACGT"[orig]
    # false positives: at most a couple across 3 kb
    fps = [p for p in called if p not in truth]
    assert len(fps) <= 2, f"too many false positives: {fps}"


def test_e2e_alignment_quality(world):
    model, true_genome, ref_genome, index, reads, truth = world
    rd = reads[0]
    rec = preprocess_read(rd.signal.astype(np.float32), rd.basecall,
                          rd.move_index, index, ref_genome, rd.read_id)
    batch = assemble_batch([rec], model, CFG)
    out = align_batch(batch, model, CFG, backend="scan")
    t = int(batch.t_len[0])
    path = np.asarray(out["path"][0, :t])
    # map truth into window coords
    if rd.strand > 0:
        shift = rd.ref_start - rec.anchor.ref_start
    else:
        shift = rec.anchor.ref_end - rd.ref_end
    err = np.abs(path - (rd.true_path + shift))
    assert np.mean(err <= 3) > 0.85, f"alignment degraded: {np.mean(err <= 3)}"
