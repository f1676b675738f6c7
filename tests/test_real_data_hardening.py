"""Real-data ingest hardening (VERDICT round-1 item 7; SURVEY.md §2
pore-model / read-ingest rows, BASELINE.json config 5).

No real nanopore data exists in this sandbox, so these tests fabricate the
real world's formats faithfully: a full 4096-entry pA-scale ONT model tsv
with the real header/extra columns, a vbz-compressed fast5 (unknown HDF5
filter), and a fake pod5 reader module exercising the calibration path.
"""

import os
import sys
import types

import numpy as np
import pytest

from nadavca_tpu.genome import encode_bases
from nadavca_tpu.kmer_model import KmerModel, default_model

h5py = pytest.importorskip("h5py")


# --------------------------------------------------------- ONT model tsv
def _write_ont_model(path, k=6, scale_pa=True, crlf=False, extra_cols=True):
    """A full 4^k table in the real R9.4 file shape: header row, pA-scale
    levels, sd_mean/sd_stdv/weight columns."""
    rng = np.random.default_rng(5)
    n = 4 ** k
    base = default_model(k)
    mu = base.level_mean.astype(np.float64)
    sg = base.level_std.astype(np.float64)
    if scale_pa:  # embed into picoamp scale like a real table
        mu = 90.0 + 11.0 * mu
        sg = 11.0 * sg
    eol = "\r\n" if crlf else "\n"
    with open(path, "w", newline="") as f:
        hdr = "kmer\tlevel_mean\tlevel_stdv"
        if extra_cols:
            hdr += "\tsd_mean\tsd_stdv\tweight"
        f.write(hdr + eol)
        for idx in range(n):
            digits = []
            rem = idx
            for _ in range(k):
                digits.append("ACGT"[rem % 4])
                rem //= 4
            km = "".join(reversed(digits))
            row = f"{km}\t{mu[idx]:.6f}\t{sg[idx]:.6f}"
            if extra_cols:
                row += f"\t{rng.uniform(1, 3):.4f}\t{rng.uniform(0.1, 1):.4f}\t1000"
            f.write(row + eol)
    return mu, sg


def test_load_full_ont_tsv_pa_scale(tmp_path):
    """The loader must ingest a real-shaped 4096-kmer pA-scale table and
    auto-standardize it to the pipeline's normalized-signal scale."""
    p = str(tmp_path / "r9.4_450bps.nucleotide.6mer.template.model")
    mu_pa, sg_pa = _write_ont_model(p, scale_pa=True, extra_cols=True)
    m = KmerModel.load_tsv(p)
    assert m.k == 6 and m.level_mean.shape == (4096,)
    # standardized: zero mean, unit std; stds scaled by the same factor
    assert abs(float(m.level_mean.mean())) < 1e-3
    assert abs(float(m.level_mean.std()) - 1.0) < 1e-3
    s = mu_pa.std()
    np.testing.assert_allclose(m.level_std, sg_pa / s, rtol=1e-4)
    # ordering preserved: the pA-ranking of kmers survives standardization
    assert (np.argsort(m.level_mean) == np.argsort(mu_pa)).all()


def test_load_ont_tsv_crlf_and_never(tmp_path):
    p = str(tmp_path / "model_crlf.tsv")
    mu_pa, _ = _write_ont_model(p, scale_pa=True, crlf=True, extra_cols=False)
    m = KmerModel.load_tsv(p, normalize="never")
    np.testing.assert_allclose(m.level_mean, mu_pa.astype(np.float32), rtol=1e-5)


def test_load_tsv_normalized_scale_untouched(tmp_path):
    """A table already on normalized scale must pass through unchanged under
    normalize='auto'."""
    p = str(tmp_path / "model_norm.tsv")
    base = default_model(6)
    base.save_tsv(p)
    m = KmerModel.load_tsv(p)
    np.testing.assert_allclose(m.level_mean, base.level_mean, atol=2e-6)
    np.testing.assert_allclose(m.level_std, base.level_std, atol=2e-6)


def test_load_tsv_incomplete_table_raises(tmp_path):
    p = str(tmp_path / "partial.tsv")
    with open(p, "w") as f:
        f.write("kmer\tlevel_mean\tlevel_stdv\n")
        f.write("AAAAAA\t90.0\t2.0\n")
    with pytest.raises(ValueError, match="covers 1/4096"):
        KmerModel.load_tsv(p)


# ----------------------------------------------------------- vbz fast5
def test_vbz_fast5_raises_actionable_error(tmp_path):
    """A fast5 whose Signal uses ONT's vbz filter (id 32020, not installed
    here) must fail with a message naming vbz, not a bare HDF5 OSError."""
    from nadavca_tpu.io import fast5 as f5

    path = str(tmp_path / "vbz.fast5")
    with h5py.File(path, "w") as f:
        g = f.create_group("read_abc")
        raw = g.create_group("Raw")
        try:
            dset = raw.create_dataset(
                "Signal", shape=(100,), dtype=np.int16,
                compression=f5.VBZ_FILTER_ID, allow_unknown_filter=True,
                chunks=(100,),
            )
            # store one raw (opaque "vbz-compressed") chunk so that reading
            # it back genuinely requires the filter
            dset.id.write_direct_chunk((0,), b"\x01\x02\x03\x04" * 10)
        except (ValueError, TypeError) as e:  # h5py too old for the flag
            pytest.skip(f"cannot fabricate unknown-filter dataset: {e}")
        ch = g.create_group("channel_id")
        ch.attrs["digitisation"] = 8192.0
        ch.attrs["offset"] = 0.0
        ch.attrs["range"] = 1400.0
        ch.attrs["sampling_rate"] = 4000.0
    with pytest.raises(RuntimeError, match="vbz"):
        f5.read_fast5(path)


# ----------------------------------------------------------------- pod5
class _FakeCalibration:
    offset = 12.0
    scale = 0.25


class _FakeRunInfo:
    sample_rate = 5000


class _FakeRead:
    def __init__(self, rid, signal):
        self.read_id = rid
        self.signal = signal
        self.calibration = _FakeCalibration()
        self.run_info = _FakeRunInfo()


class _FakeReader:
    def __init__(self, path):
        self.path = path

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def reads(self):
        rng = np.random.default_rng(9)
        yield _FakeRead("p1", rng.integers(0, 2000, 50).astype(np.int16))
        yield _FakeRead("p2", rng.integers(0, 2000, 70).astype(np.int16))


def test_pod5_reader_logic_with_fake_module(monkeypatch, tmp_path):
    """Execute read_pod5's real body against a fake pod5 module: calibration
    math, RawRead construction, directory iteration."""
    from nadavca_tpu.io import pod5 as p5

    fake = types.SimpleNamespace(Reader=_FakeReader)
    monkeypatch.setattr(p5, "_pod5", fake)
    monkeypatch.setattr(p5, "HAVE_POD5", True)
    d = tmp_path / "pods"
    d.mkdir()
    (d / "a.pod5").write_bytes(b"")
    (d / "skip.txt").write_bytes(b"")
    reads = list(p5.iter_pod5_dir(str(d)))
    assert [r.read_id for r in reads] == ["p1", "p2"]
    assert reads[0].sampling_rate == 5000.0
    assert reads[0].basecall is None and reads[0].move_index is None
    # calibration: (dac + offset) * scale
    rng = np.random.default_rng(9)
    dac = rng.integers(0, 2000, 50).astype(np.int16)
    np.testing.assert_allclose(
        reads[0].signal_pa, (dac.astype(np.float32) + 12.0) * 0.25)


def test_pod5_unavailable_raises(monkeypatch):
    from nadavca_tpu.io import pod5 as p5

    monkeypatch.setattr(p5, "HAVE_POD5", False)
    with pytest.raises(RuntimeError, match="pod5"):
        p5.read_pod5("x.pod5")
