"""fast5 ingest: write simulated reads, read them back, normalize."""

import numpy as np
import pytest

from nadavca_tpu.io import fast5
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model

pytestmark = pytest.mark.skipif(not fast5.HAVE_H5PY, reason="h5py unavailable")


@pytest.fixture(scope="module")
def sim_reads():
    rng = np.random.default_rng(5)
    model = default_model()
    genome = random_genome(rng, length=2000)
    return [
        simulate_read(genome, "ref", model, rng, read_len=200, read_id=f"r{i}")
        for i in range(3)
    ]


def test_fast5_roundtrip(tmp_path, sim_reads):
    p = str(tmp_path / "batch.fast5")
    fast5.write_fast5(p, sim_reads)
    back = fast5.read_fast5(p)
    assert [r.read_id for r in back] == [r.read_id for r in sim_reads]
    for orig, rb in zip(sim_reads, back):
        assert rb.basecall == orig.basecall
        np.testing.assert_array_equal(rb.move_index, orig.move_index)
        # calibrated pA signal should be an affine map of the original
        # normalized signal (up to DAC quantization)
        a = np.polyfit(orig.signal, rb.signal_pa.astype(np.float64), 1)
        resid = rb.signal_pa - (a[0] * orig.signal + a[1])
        assert np.abs(resid).max() < 0.5  # within DAC step


def test_normalization_recovers_unit_scale(tmp_path, sim_reads):
    p = str(tmp_path / "b.fast5")
    fast5.write_fast5(p, sim_reads)
    back = fast5.read_fast5(p)
    for orig, rb in zip(sim_reads, back):
        norm = rb.normalized("mad")
        # MAD-normalization of the affine-embedded signal should closely
        # track a MAD-normalization of the original (both unit scale)
        orig_norm = fast5.normalize_signal(orig.signal, "mad")
        # allow a global scale factor (model scale vs MAD scale)
        corr = np.corrcoef(norm, orig_norm)[0, 1]
        assert corr > 0.999


def test_iter_fast5_dir(tmp_path, sim_reads):
    fast5.write_fast5(str(tmp_path / "a.fast5"), sim_reads[:2])
    fast5.write_fast5(str(tmp_path / "b.fast5"), sim_reads[2:])
    got = list(fast5.iter_fast5_dir(str(tmp_path)))
    assert len(got) == 3


def test_normalize_methods():
    x = np.array([1.0, 2.0, 3.0, 100.0])
    m = fast5.normalize_signal(x, "mad")
    assert np.isfinite(m).all()
    z = fast5.normalize_signal(x, "meanstd")
    assert abs(float(np.mean(z))) < 1e-6
    with pytest.raises(ValueError):
        fast5.normalize_signal(x, "nope")
