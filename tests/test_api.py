"""Public library API (``nadavca_tpu.align_signal`` / ``call_snps``).

Reference parity for the documented ``import nadavca`` entry point
(SURVEY.md §3.3): fast5 in, per-read alignment objects (signal ranges +
likelihoods) out — no files written — plus the SNP-calling twin. Uses
simulated fast5 data (SURVEY §7.3 item 7: simulator as interim oracle).
"""

import os

import numpy as np
import pytest

import nadavca_tpu
from nadavca_tpu import align_signal, call_snps
from nadavca_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("api_data")
    rc = cli_main([
        "simulate", "-o", str(out), "--reads", "24", "--files", "2",
        "--read-length", "500", "--genome-length", "3000", "--snps", "2",
        "--seed", "7",
    ])
    assert rc == 0
    truth = {}
    with open(out / "truth_snps.tsv") as f:
        next(f)
        for line in f:
            contig, pos, sample_base, _ref = line.split()
            truth[int(pos)] = sample_base
    return str(out / "reference.fasta"), str(out), truth


def test_align_signal_objects(dataset):
    ref, fast5_dir, _ = dataset
    alns = align_signal(ref, fast5_dir, backend="scan", batch_reads=32)
    assert len(alns) >= 20
    for a in alns:
        assert a.contig == "ref"
        assert a.strand in (-1, 1)
        assert 0 <= a.ref_start < a.ref_end <= 3000
        wlen = a.ref_end - a.ref_start
        assert a.seg_start.shape[0] <= wlen and a.seg_start.shape[0] > 0
        # visited positions: valid, half-open, monotone ranges
        vis = a.seg_start >= 0
        assert vis.mean() > 0.8, "most positions should be visited"
        assert np.all(a.seg_end[vis] > a.seg_start[vis])
        starts = a.seg_start[vis]
        assert np.all(np.diff(starts) >= 0)
        assert np.isfinite(a.score)
        assert a.base_loglik is not None
        assert a.base_loglik.shape[1] == 4
        assert np.isfinite(a.base_loglik[vis.nonzero()[0]]).all()


def test_align_signal_file_list_and_no_probs(dataset):
    ref, fast5_dir, _ = dataset
    files = sorted(
        os.path.join(fast5_dir, f) for f in os.listdir(fast5_dir)
        if f.endswith(".fast5")
    )
    alns = align_signal(ref, files[:1], backend="scan",
                        compute_probabilities=False)
    assert 0 < len(alns) <= 12
    assert all(a.base_loglik is None for a in alns)


def test_call_snps_api(dataset):
    ref, fast5_dir, truth = dataset
    calls = call_snps(ref, fast5_dir, backend="scan", batch_reads=32,
                      workers=2)
    called = {c.position: c.alt_base for c in calls}
    hits = sum(1 for p, b in truth.items() if called.get(p) == b)
    assert hits == len(truth), f"missed planted SNPs: {truth} vs {called}"
    fps = [p for p in called if p not in truth]
    assert len(fps) <= 1, f"false positives: {fps}"


def test_package_exports():
    for name in ("align_signal", "call_snps", "ReadAlignment", "SnpCall",
                 "Genome", "KmerModel", "AlignConfig"):
        assert hasattr(nadavca_tpu, name), name
