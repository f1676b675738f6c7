"""SNP aggregation, posteriors, strand handling, VCF output."""

import numpy as np
import jax.numpy as jnp

from nadavca_tpu import call
from nadavca_tpu.config import AlignConfig


def test_accumulate_forward_strand():
    G, R, L = 50, 2, 10
    acc, cov = call.make_accumulators(G)
    ll = np.zeros((R, L, 4), np.float32)
    ll[0, 3, 2] = 5.0   # read 0, window pos 3, base G
    ll[1, 0, 1] = 2.0
    acc, cov = call.accumulate_batch(
        acc, cov, jnp.asarray(ll),
        jnp.asarray([10, 20], jnp.int32), jnp.asarray([L, L], jnp.int32),
        jnp.asarray([1, 1], jnp.int32),
    )
    acc = np.asarray(acc); cov = np.asarray(cov)
    assert acc[13, 2] == 5.0
    assert acc[20, 1] == 2.0
    assert cov[10:20].sum() == 10 and cov[20:30].sum() == 10
    assert cov[:10].sum() == 0


def test_accumulate_reverse_strand_complement():
    G, L = 40, 8
    acc, cov = call.make_accumulators(G)
    ll = np.zeros((1, L, 4), np.float32)
    ll[0, 2, 0] = 3.0   # window pos 2, base A (read direction)
    acc, cov = call.accumulate_batch(
        acc, cov, jnp.asarray(ll),
        jnp.asarray([10], jnp.int32), jnp.asarray([L], jnp.int32),
        jnp.asarray([-1], jnp.int32),
    )
    acc = np.asarray(acc)
    # reverse strand: window pos 2 -> genome pos 10 + (8-1-2) = 15; base A -> T
    assert acc[15, 3] == 3.0
    assert acc.sum() == 3.0


def test_accumulate_masks_padding():
    G, L = 30, 6
    acc, cov = call.make_accumulators(G)
    ll = np.ones((1, L, 4), np.float32)
    acc, cov = call.accumulate_batch(
        acc, cov, jnp.asarray(ll),
        jnp.asarray([5], jnp.int32), jnp.asarray([3], jnp.int32),  # only 3 valid
        jnp.asarray([1], jnp.int32),
    )
    assert np.asarray(cov).sum() == 3


def test_call_and_vcf(tmp_path):
    G = 20
    ref = np.zeros(G, np.int64)  # all A
    acc = np.zeros((G, 4), np.float32)
    cov = np.full(G, 5, np.int32)
    acc[7, 2] = 50.0  # strong G evidence at pos 7
    cfg = AlignConfig(snp_threshold=0.9)
    calls = call.call_snps(acc, cov, ref, "chr1", cfg)
    assert len(calls) == 1
    c = calls[0]
    assert (c.position, c.ref_base, c.alt_base) == (7, "A", "G")
    assert c.probability > 0.99
    p = str(tmp_path / "out.vcf")
    call.write_vcf(p, calls)
    lines = [l for l in open(p) if not l.startswith("#")]
    assert len(lines) == 1
    fields = lines[0].split("\t")
    assert fields[0] == "chr1" and fields[1] == "8"  # 1-based
    assert fields[3] == "A" and fields[4] == "G"


def test_write_alignment(tmp_path):
    p = str(tmp_path / "aln.txt")
    call.write_alignment(
        p, "r1", "chr1", 1, 100, 110,
        np.array([0, 2, -1]), np.array([2, 5, -1]),
    )
    lines = open(p).read().splitlines()
    assert lines[0].startswith("# read=r1")
    assert lines[1] == "0\t0\t2"
    assert len(lines) == 3  # header + 2 visited positions
