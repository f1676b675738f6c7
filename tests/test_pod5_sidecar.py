"""pod5 + sidecar basecalls end-to-end: signal-only reads must produce SNP
calls once ``--basecalls`` joins a basecall source (VERDICT r2 task 6 — pod5
stores raw signal only, so without a sidecar every pod5 read is dropped by
the preprocessors and the format support is surface, not a working path)."""

import os
import types

import numpy as np
import pytest

from nadavca_tpu.genome import decode_bases
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model


class _FakeCalibration:
    offset = 10.0
    scale = 0.5


class _FakeRunInfo:
    sample_rate = 5000


class _FakeRead:
    def __init__(self, rid, dac):
        self.read_id = rid
        self.signal = dac
        self.calibration = _FakeCalibration()
        self.run_info = _FakeRunInfo()


def _make_world(tmp_path, n_reads=16, read_len=300, glen=800, seed=13):
    rng = np.random.default_rng(seed)
    model = default_model()
    genome = random_genome(rng, length=glen)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=read_len,
                      read_id=f"p5_{i:03d}")
        for i in range(n_reads)
    ]
    # plant one SNP into the WRITTEN reference; the reads keep the truth
    contig = genome.contigs[0]
    pos = glen // 2
    orig = int(contig.codes[pos])
    contig.codes[pos] = (orig + 2) % 4
    ref_path = tmp_path / "reference.fasta"
    genome.to_fasta(str(ref_path))

    # "pod5" signal: an affine DAC encoding the calibration must undo
    fakes = []
    for r in reads:
        dac = (r.signal.astype(np.float32) / _FakeCalibration.scale
               - _FakeCalibration.offset)
        fakes.append(_FakeRead(r.read_id, dac))

    sidecar = tmp_path / "basecalls.tsv"
    with open(sidecar, "w") as f:
        f.write("# read_id\tbasecall\tmoves\n")
        for r in reads:
            f.write(f"{r.read_id}\t{r.basecall}\t"
                    + ",".join(str(int(v)) for v in r.move_index) + "\n")

    data = tmp_path / "data"
    data.mkdir()
    (data / "reads.pod5").write_bytes(b"fake")
    return ref_path, data, sidecar, pos, orig, fakes


def test_pod5_sidecar_snp_e2e(tmp_path, monkeypatch):
    from nadavca_tpu import cli as climod
    from nadavca_tpu.io import pod5 as p5

    ref_path, data, sidecar, pos, orig, fakes = _make_world(tmp_path)

    class _FakeReader:
        def __init__(self, path):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def reads(self):
            return iter(fakes)

    monkeypatch.setattr(p5, "HAVE_POD5", True)
    monkeypatch.setattr(p5, "_pod5", types.SimpleNamespace(Reader=_FakeReader))

    out_vcf = tmp_path / "calls.vcf"
    rc = climod.main([
        "snp", str(ref_path), str(data), "-o", str(out_vcf),
        "--backend", "scan", "--workers", "1", "--batch-reads", "16",
        "--basecalls", str(sidecar),
    ])
    assert rc == 0
    body = [l for l in out_vcf.read_text().splitlines()
            if l and not l.startswith("#")]
    called = {int(l.split("\t")[1]) - 1: l.split("\t")[4] for l in body}
    assert pos in called, (pos, body)
    assert called[pos] == "ACGT"[orig], (called[pos], orig, body)


def test_pod5_without_sidecar_drops_everything(tmp_path, monkeypatch):
    """Without --basecalls every pod5 read is (counted and) skipped."""
    from nadavca_tpu import cli as climod
    from nadavca_tpu.io import pod5 as p5

    ref_path, data, _sidecar, _pos, _orig, fakes = _make_world(tmp_path)

    class _FakeReader:
        def __init__(self, path):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def reads(self):
            return iter(fakes)

    monkeypatch.setattr(p5, "HAVE_POD5", True)
    monkeypatch.setattr(p5, "_pod5", types.SimpleNamespace(Reader=_FakeReader))

    out_vcf = tmp_path / "calls.vcf"
    rc = climod.main([
        "snp", str(ref_path), str(data), "-o", str(out_vcf),
        "--backend", "scan", "--workers", "1", "--batch-reads", "16",
    ])
    assert rc == 0
    body = [l for l in out_vcf.read_text().splitlines()
            if l and not l.startswith("#")]
    assert body == []  # nothing aligned, nothing called


def test_sidecar_sam_mv_tag(tmp_path):
    """SAM mv:B:c move tables decode to per-base signal start indices."""
    from nadavca_tpu.io.sidecar import load_sidecar_basecalls

    sam = tmp_path / "calls.sam"
    # stride 5, trim 10; bases start at flags==1: strides 0, 2, 3
    sam.write_text(
        "@HD\tVN:1.6\n"
        "read1\t4\t*\t0\t0\t*\t*\t0\t0\tACG\t!!!\t"
        "ts:i:10\tmv:B:c,5,1,0,1,1\n"
    )
    sc = load_sidecar_basecalls(str(sam))
    assert "read1" in sc
    bc, mv = sc["read1"]
    assert bc == "ACG"
    np.testing.assert_array_equal(mv, [10, 20, 25])


def test_sidecar_sam_flag_handling(tmp_path):
    """FLAG semantics (ADVICE r3): secondary/supplementary records are
    skipped (never overwriting the primary), reverse-strand SEQ is restored
    to signal orientation, and hard-clip length mismatches skip the record
    instead of aborting the load."""
    from nadavca_tpu.io.sidecar import load_sidecar_basecalls

    sam = tmp_path / "calls.sam"
    sam.write_text(
        "@HD\tVN:1.6\n"
        # primary forward record
        "read1\t0\tc\t1\t60\t3M\t*\t0\t0\tACG\t!!!\tmv:B:c,5,1,0,1,1\n"
        # secondary for the same read: must NOT overwrite the primary
        "read1\t256\tc\t9\t0\t3M\t*\t0\t0\tTTT\t!!!\tmv:B:c,5,1,1,1,0\n"
        # supplementary, hard-clipped partial SEQ: skipped
        "read2\t2048\tc\t1\t60\t1M2H\t*\t0\t0\tA\t!\tmv:B:c,5,1,0,1,1\n"
        # reverse-strand mapped: SEQ is revcomp'd back to signal orientation
        "read3\t16\tc\t1\t60\t3M\t*\t0\t0\tACG\t!!!\tmv:B:c,5,1,0,1,1\n"
        # primary with a move/SEQ length mismatch (e.g. hard clip): skipped
        "read4\t0\tc\t1\t60\t2M1H\t*\t0\t0\tAC\t!!\tmv:B:c,5,1,0,1,1\n"
    )
    sc = load_sidecar_basecalls(str(sam))
    assert set(sc) == {"read1", "read3"}
    assert sc["read1"][0] == "ACG"
    np.testing.assert_array_equal(sc["read1"][1], [0, 10, 15])
    assert sc["read3"][0] == "CGT"  # revcomp("ACG")
    np.testing.assert_array_equal(sc["read3"][1], [0, 10, 15])
