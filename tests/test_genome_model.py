"""Tests of the domain data layer: genome encoding, k-mers, pore model."""

import numpy as np

from nadavca_tpu.genome import (
    Genome, decode_bases, encode_bases, kmer_ids, reverse_complement,
)
from nadavca_tpu.kmer_model import KmerModel, default_model


def test_encode_decode_roundtrip():
    s = "ACGTACGTNNAC"
    codes = encode_bases(s)
    assert decode_bases(codes) == s
    np.testing.assert_array_equal(codes[:4], [0, 1, 2, 3])
    assert codes[8] == 4  # N


def test_reverse_complement():
    codes = encode_bases("AACGT")
    rc = reverse_complement(codes)
    assert decode_bases(rc) == "ACGTT"
    np.testing.assert_array_equal(reverse_complement(rc), codes)


def test_kmer_ids():
    codes = encode_bases("ACGT")
    ids = kmer_ids(codes, 2)
    # AC=0*4+1=1, CG=1*4+2=6, GT=2*4+3=11
    np.testing.assert_array_equal(ids, [1, 6, 11])
    # N windows get -1
    ids_n = kmer_ids(encode_bases("ANG"), 2)
    np.testing.assert_array_equal(ids_n, [-1, -1])


def test_fasta_roundtrip(tmp_path):
    g = Genome.from_dict({"chr1": "ACGTACGTAC" * 20, "chr2": "TTTTGGGG"})
    p = str(tmp_path / "ref.fa")
    g.to_fasta(p)
    g2 = Genome.from_fasta(p)
    assert [c.name for c in g2] == ["chr1", "chr2"]
    for c in g:
        np.testing.assert_array_equal(g2[c.name].codes, c.codes)


def test_window_strands():
    g = Genome.from_dict({"c": "AACGTT"})
    fwd = g.window("c", 1, 5, +1)
    assert decode_bases(fwd) == "ACGT"
    rev = g.window("c", 1, 5, -1)
    assert decode_bases(rev) == "ACGT"[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_synthetic_model_deterministic():
    m1 = KmerModel.synthetic(k=4, seed=1)
    m2 = KmerModel.synthetic(k=4, seed=1)
    np.testing.assert_array_equal(m1.level_mean, m2.level_mean)
    assert m1.level_mean.shape == (256,)
    assert (m1.level_std > 0).all()
    # normalized scale
    assert abs(m1.level_mean.mean()) < 1e-5
    assert abs(m1.level_mean.std() - 1.0) < 1e-4


def test_model_tsv_roundtrip(tmp_path):
    m = KmerModel.synthetic(k=3)
    p = str(tmp_path / "model.tsv")
    m.save_tsv(p)
    m2 = KmerModel.load_tsv(p)
    assert m2.k == 3
    np.testing.assert_allclose(m2.level_mean, m.level_mean, atol=1e-6)
    np.testing.assert_allclose(m2.level_std, m.level_std, atol=1e-6)


def test_expected_signal_shapes():
    m = default_model()
    codes = encode_bases("ACGTACGTACGT")
    mu, sigma = m.expected_signal(codes)
    assert mu.shape == (len(codes) - m.k + 1,)
    assert (sigma > 0).all()
