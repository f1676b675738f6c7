"""Native (C++) host prep vs the Python path — exact structural parity.

csrc/prep.cpp reimplements normalize → anchor → path → levels → calibration
with the same numeric conventions; anchors/paths/windows must match exactly
and calibrated signals to float tolerance (the only difference is summation
order inside the double-precision fit).
"""

import numpy as np
import pytest

from nadavca_tpu.anchor import SeedIndex
from nadavca_tpu.config import AlignConfig
from nadavca_tpu.io import fast5 as fast5mod
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.pipeline import preprocess_read

prep_native = pytest.importorskip("nadavca_tpu.prep_native")
if not prep_native.available():
    pytest.skip("no native toolchain", allow_module_level=True)

CFG = AlignConfig()


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(11)
    model = default_model()
    genome = random_genome(rng, length=20000)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=400,
                      start=int(rng.integers(0, 19000)),
                      strand=1 if i % 2 else -1, read_id=f"r{i}")
        for i in range(12)
    ]
    return model, genome, reads


def test_prep_parity(world):
    model, genome, reads = world
    index = SeedIndex(genome)
    native = prep_native.NativePrep(genome)
    n_ok = 0
    for rd in reads:
        # raw pA-scale signal (simulator emits model-scale; shift/scale it)
        raw = rd.signal * 23.0 + 90.0
        sig = fast5mod.normalize_signal(raw, CFG.normalization)
        py = preprocess_read(sig, rd.basecall, rd.move_index, index, genome,
                             rd.read_id, model=model)
        nt = native.prep_read(raw, rd.basecall, rd.move_index, CFG,
                              model=model, read_id=rd.read_id)
        assert (py is None) == (nt is None), rd.read_id
        if py is None:
            continue
        n_ok += 1
        assert nt.anchor.contig == py.anchor.contig
        assert nt.anchor.strand == py.anchor.strand
        assert nt.anchor.ref_start == py.anchor.ref_start
        assert nt.anchor.ref_end == py.anchor.ref_end
        assert nt.anchor.score == py.anchor.score
        np.testing.assert_array_equal(nt.window_codes, py.window_codes)
        np.testing.assert_array_equal(nt.anchor_path, py.anchor_path)
        np.testing.assert_array_equal(nt.anchor.base_to_window,
                                      py.anchor.base_to_window)
        np.testing.assert_allclose(nt.mu, py.mu, rtol=0, atol=0)
        np.testing.assert_allclose(nt.sigma, py.sigma, rtol=0, atol=0)
        np.testing.assert_allclose(nt.signal, py.signal, rtol=1e-5, atol=2e-5)
    assert n_ok >= 10, f"too few anchored reads: {n_ok}"


def test_prep_no_model(world):
    """Without a pore model the native path skips calibration, like Python."""
    model, genome, reads = world
    index = SeedIndex(genome)
    native = prep_native.NativePrep(genome)
    rd = reads[0]
    raw = rd.signal * 23.0 + 90.0
    sig = fast5mod.normalize_signal(raw, CFG.normalization)
    py = preprocess_read(sig, rd.basecall, rd.move_index, index, genome,
                         rd.read_id, model=None)
    nt = native.prep_read(raw, rd.basecall, rd.move_index, CFG, model=None,
                          read_id=rd.read_id)
    assert nt.mu is None
    np.testing.assert_allclose(nt.signal, py.signal, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(nt.anchor_path, py.anchor_path)


def test_prep_garbage_read(world):
    """A read with no genome support must return None, not crash."""
    model, genome, _ = world
    native = prep_native.NativePrep(genome)
    rng = np.random.default_rng(0)
    bases = "ACGT"
    bc = "".join(bases[i] for i in rng.integers(0, 4, size=300))
    raw = rng.normal(90.0, 10.0, size=3000).astype(np.float32)
    mv = np.sort(rng.integers(0, 3000, size=300)).astype(np.int64)
    assert native.prep_read(raw, bc, mv, CFG, model=model) is None
