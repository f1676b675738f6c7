"""Pallas fill kernel (interpret mode on CPU) vs the lax.scan path and spec.

Both paths are fed the SAME chunked bands (sched.build_chunked_bands), so
results must agree cell-for-cell up to f32-vs-f64 rounding; paths are compared
exactly (ties at f32 resolution are possible in principle but the fixtures
have healthy margins).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nadavca_tpu.config import AlignConfig
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import banded_dp, dp_spec, pallas_dp
from nadavca_tpu.sched import build_chunked_bands

CFG = AlignConfig(band_width=128, signal_chunk=128, read_tile=8)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(77)
    model = default_model()
    genome = random_genome(rng, length=3000)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=ln, strand=1, mean_dwell=8.0)
        for ln in (200, 350, 260, 150, 300, 180, 220, 330)  # R = 8 = one tile
    ]
    R = len(reads)
    T = 128 * ((max(len(r.signal) for r in reads) + 127) // 128)
    L = max(len(r.window_codes) for r in reads)
    N = L - model.k + 1
    x = np.zeros((R, T), np.float32)
    t_len = np.zeros(R, np.int32)
    mu = np.zeros((R, N), np.float32)
    sigma = np.ones((R, N), np.float32)
    n_ref = np.zeros(R, np.int32)
    anchors = np.zeros((R, T), np.float64)
    for r, rd in enumerate(reads):
        t = len(rd.signal)
        x[r, :t] = rd.signal
        t_len[r] = t
        m, s = model.expected_signal(rd.window_codes)
        mu[r, : len(m)] = m
        sigma[r, : len(m)] = s
        n_ref[r] = len(m)
        anchors[r, :t] = rd.true_path
        anchors[r, t:] = rd.true_path[-1]
    bands = build_chunked_bands(anchors, t_len, n_ref, CFG.band_width, CFG.signal_chunk)
    return dict(x=x, t_len=t_len, mu=mu, sigma=sigma, n_ref=n_ref,
                bands=bands, reads=reads, model=model)


def test_pallas_matches_scan(batch):
    b = batch
    bands = b["bands"]
    lo_full = bands.expand(b["x"].shape[1])
    scan_res = banded_dp.banded_viterbi_batch(
        b["x"], b["t_len"], b["mu"], b["sigma"], b["n_ref"], lo_full, CFG
    )
    pl_res, decs = pallas_dp.pallas_viterbi_batch(
        jnp.asarray(b["x"]), jnp.asarray(b["t_len"]), jnp.asarray(b["mu"]),
        jnp.asarray(b["sigma"]), jnp.asarray(b["n_ref"]),
        jnp.asarray(bands.lo), jnp.asarray(bands.delta), CFG, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(pl_res.score), np.asarray(scan_res.score), rtol=1e-4, atol=1e-2
    )
    for r in range(b["x"].shape[0]):
        t = int(b["t_len"][r])
        sp = np.asarray(scan_res.path[r, :t])
        pp = np.asarray(pl_res.path[r, :t])
        frac = np.mean(sp == pp)
        assert frac == 1.0, f"read {r}: path agreement {frac}"


def test_pallas_matches_f64_spec(batch):
    """End-to-end vs the float64 oracle on the same chunked bands."""
    b = batch
    bands = b["bands"]
    pl_res, _ = pallas_dp.pallas_viterbi_batch(
        jnp.asarray(b["x"]), jnp.asarray(b["t_len"]), jnp.asarray(b["mu"]),
        jnp.asarray(b["sigma"]), jnp.asarray(b["n_ref"]),
        jnp.asarray(bands.lo), jnp.asarray(bands.delta), CFG, interpret=True,
    )
    lo_full = bands.expand(b["x"].shape[1])
    for r, rd in enumerate(b["reads"]):
        t = int(b["t_len"][r])
        n = int(b["n_ref"][r])
        score, path = dp_spec.banded_viterbi(
            rd.signal,
            b["mu"][r, :n].astype(np.float64),
            b["sigma"][r, :n].astype(np.float64),
            lo_full[r, :t].astype(np.int64),
            CFG,
        )
        pp = np.asarray(pl_res.path[r, :t])
        agree = np.mean(pp == path)
        assert agree > 0.999, f"read {r}: path agreement vs spec {agree}"
        assert np.isclose(float(pl_res.score[r]), score, rtol=1e-4, atol=0.05)


def test_pallas_batching_invariance(batch):
    """First tile alone == same reads inside a 2-tile batch (zero-pad tile 2)."""
    b = batch
    bands = b["bands"]
    args1 = (
        jnp.asarray(b["x"]), jnp.asarray(b["t_len"]), jnp.asarray(b["mu"]),
        jnp.asarray(b["sigma"]), jnp.asarray(b["n_ref"]),
        jnp.asarray(bands.lo), jnp.asarray(bands.delta),
    )
    res1, _ = pallas_dp.pallas_viterbi_batch(*args1, CFG, interpret=True)

    def pad2(a, fill=0):
        a = np.asarray(a)
        out = np.full((a.shape[0] * 2,) + a.shape[1:], fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    x2 = pad2(b["x"]); tl2 = pad2(b["t_len"]); mu2 = pad2(b["mu"])
    sg2 = pad2(b["sigma"], fill=1); nr2 = pad2(b["n_ref"])
    lo2 = pad2(bands.lo); dl2 = pad2(bands.delta)
    tl2[8:] = 1  # keep padded reads minimally alive
    nr2[8:] = 1
    res2, _ = pallas_dp.pallas_viterbi_batch(
        jnp.asarray(x2), jnp.asarray(tl2), jnp.asarray(mu2), jnp.asarray(sg2),
        jnp.asarray(nr2), jnp.asarray(lo2), jnp.asarray(dl2), CFG, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(res1.path), np.asarray(res2.path[:8]))
    np.testing.assert_allclose(
        np.asarray(res1.score), np.asarray(res2.score[:8]), rtol=0, atol=0
    )
