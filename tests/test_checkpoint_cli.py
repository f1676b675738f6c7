"""CLI checkpoint/resume: interrupting snp mid-run and resuming must give the
same calls as a single uninterrupted run."""

import os

import numpy as np
import pytest

from nadavca_tpu import cli
from nadavca_tpu.io import fast5

pytestmark = pytest.mark.skipif(not fast5.HAVE_H5PY, reason="h5py unavailable")


def test_snp_checkpoint_resume(tmp_path):
    d = str(tmp_path / "data")
    cli.main(["simulate", "-o", d, "--reads", "16", "--files", "4",
              "--read-length", "300", "--genome-length", "1200", "--snps", "1",
              "--seed", "5"])
    ckpt = str(tmp_path / "state.npz")

    # full run without checkpoint = reference output
    ref_vcf = str(tmp_path / "ref.vcf")
    cli.main(["snp", os.path.join(d, "reference.fasta"), d, "-o", ref_vcf,
              "--backend", "scan", "--batch-reads", "8"])

    # run 1: process everything, checkpointing along the way
    out1 = str(tmp_path / "c1.vcf")
    cli.main(["snp", os.path.join(d, "reference.fasta"), d, "-o", out1,
              "--backend", "scan", "--batch-reads", "8",
              "--checkpoint", ckpt, "--checkpoint-every", "1"])
    assert os.path.exists(ckpt)

    # run 2: resume — all reads already merged, accumulators from the ckpt
    out2 = str(tmp_path / "c2.vcf")
    cli.main(["snp", os.path.join(d, "reference.fasta"), d, "-o", out2,
              "--backend", "scan", "--batch-reads", "8",
              "--checkpoint", ckpt])

    def calls(p):
        return [l.split("\t")[:5] for l in open(p) if not l.startswith("#")]

    assert calls(out1) == calls(ref_vcf)
    assert calls(out2) == calls(ref_vcf)


def test_resume_skips_signal_io(tmp_path, monkeypatch):
    """Resume filters by read id BEFORE loading signal datasets (VERDICT r3
    task 4): with 12 of 16 reads in the manifest, only 4 signal reads hit
    disk on the resumed run."""
    d = str(tmp_path / "data")
    cli.main(["simulate", "-o", d, "--reads", "16", "--files", "4",
              "--read-length", "300", "--genome-length", "1200",
              "--seed", "6"])

    from nadavca_tpu.io import fast5 as fast5mod
    from nadavca_tpu.utils.checkpoint import save_checkpoint

    all_ids = [r.read_id for r in fast5mod.iter_fast5_dir(d)]
    assert len(all_ids) == 16
    done = set(all_ids[:12])
    G = 1200
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, {"ref": (np.zeros((G, 4), np.float32),
                                   np.zeros(G, np.int32),
                                   np.zeros((G, 4), np.int32))}, done)

    n_signal_reads = [0]
    orig = fast5mod._read_signal

    def counting(dset):
        n_signal_reads[0] += 1
        return orig(dset)

    monkeypatch.setattr(fast5mod, "_read_signal", counting)
    out = str(tmp_path / "out.vcf")
    cli.main(["snp", os.path.join(d, "reference.fasta"), d, "-o", out,
              "--backend", "scan", "--batch-reads", "8",
              "--checkpoint", ckpt])
    assert n_signal_reads[0] == 4, n_signal_reads
