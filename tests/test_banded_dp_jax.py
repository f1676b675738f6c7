"""Batched JAX banded DP vs the numpy float64 oracle (dp_spec)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nadavca_tpu.config import AlignConfig
from nadavca_tpu.genome import kmer_ids
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import banded_dp, dp_spec

CFG = AlignConfig(band_width=128)


def _make_batch(reads, model, cfg, T_pad=None, N_pad=None, L_pad=None):
    """Pad a list of SimulatedReads into batch arrays + per-read spec inputs."""
    R = len(reads)
    T = T_pad or max(len(r.signal) for r in reads)
    L = L_pad or max(len(r.window_codes) for r in reads)
    N = N_pad or (L - model.k + 1)
    x = np.zeros((R, T), np.float32)
    t_len = np.zeros(R, np.int32)
    mu = np.zeros((R, N), np.float32)
    sigma = np.ones((R, N), np.float32)
    n_ref = np.zeros(R, np.int32)
    anchors = np.zeros((R, T), np.float64)
    codes = np.full((R, L), 4, np.int32)
    ids = np.full((R, N), -1, np.int32)
    for r, rd in enumerate(reads):
        t = len(rd.signal)
        x[r, :t] = rd.signal
        t_len[r] = t
        m, s = model.expected_signal(rd.window_codes)
        n = len(m)
        mu[r, :n] = m
        sigma[r, :n] = s
        n_ref[r] = n
        anchors[r, :t] = rd.true_path
        anchors[r, t:] = rd.true_path[-1]
        codes[r, : len(rd.window_codes)] = rd.window_codes
        ids[r, :n] = kmer_ids(rd.window_codes, model.k)
    lo = banded_dp.make_band_batch(anchors, t_len, n_ref, cfg.band_width)
    return dict(x=x, t_len=t_len, mu=mu, sigma=sigma, n_ref=n_ref, lo=lo,
                codes=codes, ids=ids)


def _spec_result(rd, model, cfg):
    return dp_spec.full_read_spec(
        rd.signal, rd.window_codes, model, anchor=rd.true_path.astype(np.float64),
        cfg=cfg,
    )


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(42)
    model = default_model()
    genome = random_genome(rng, length=2000)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=ln, strand=1,
                      mean_dwell=8.0)
        for ln in (150, 300, 220, 180)
    ]
    return model, genome, reads


def test_batch_matches_spec(sim):
    model, genome, reads = sim
    batch = _make_batch(reads, model, CFG)
    res = banded_dp.banded_viterbi_batch(
        batch["x"], batch["t_len"], batch["mu"], batch["sigma"],
        batch["n_ref"], batch["lo"], CFG,
    )
    for r, rd in enumerate(reads):
        spec = _spec_result(rd, model, CFG)
        t = len(rd.signal)
        np.testing.assert_array_equal(
            np.asarray(res.path[r, :t]), spec["path"],
            err_msg=f"path mismatch read {r}",
        )
        assert np.isclose(float(res.score[r]), spec["score"], rtol=1e-4, atol=1e-2), (
            f"score mismatch read {r}: {float(res.score[r])} vs {spec['score']}"
        )


def test_batching_invariance(sim):
    """A read's path must be identical alone vs padded in a batch (SURVEY §4.3)."""
    model, genome, reads = sim
    rd = reads[1]
    solo = _make_batch([rd], model, CFG)
    solo_res = banded_dp.banded_viterbi_batch(
        solo["x"], solo["t_len"], solo["mu"], solo["sigma"],
        solo["n_ref"], solo["lo"], CFG,
    )
    batch = _make_batch(reads, model, CFG, T_pad=4000, N_pad=512, L_pad=517)
    batch_res = banded_dp.banded_viterbi_batch(
        batch["x"], batch["t_len"], batch["mu"], batch["sigma"],
        batch["n_ref"], batch["lo"], CFG,
    )
    t = len(rd.signal)
    np.testing.assert_array_equal(
        np.asarray(solo_res.path[0, :t]), np.asarray(batch_res.path[1, :t])
    )
    assert np.isclose(float(solo_res.score[0]), float(batch_res.score[1]),
                      rtol=1e-5, atol=1e-3)


def test_segment_stats_batch_matches_spec(sim):
    model, genome, reads = sim
    batch = _make_batch(reads, model, CFG)
    res = banded_dp.banded_viterbi_batch(
        batch["x"], batch["t_len"], batch["mu"], batch["sigma"],
        batch["n_ref"], batch["lo"], CFG,
    )
    N = batch["mu"].shape[1]
    stats = banded_dp.segment_stats_batch(res.path, batch["x"], batch["t_len"], N)
    for r, rd in enumerate(reads):
        spec = _spec_result(rd, model, CFG)
        n = int(batch["n_ref"][r])
        np.testing.assert_allclose(
            np.asarray(stats[r, :n]), spec["stats"], rtol=1e-4, atol=1e-3
        )
        # padded tail must be empty
        assert np.asarray(stats[r, n:, 0]).sum() == 0


def test_base_loglik_batch_matches_spec(sim):
    model, genome, reads = sim
    batch = _make_batch(reads, model, CFG)
    res = banded_dp.banded_viterbi_batch(
        batch["x"], batch["t_len"], batch["mu"], batch["sigma"],
        batch["n_ref"], batch["lo"], CFG,
    )
    N = batch["mu"].shape[1]
    stats = banded_dp.segment_stats_batch(res.path, batch["x"], batch["t_len"], N)
    ll = banded_dp.base_loglik_batch(
        jnp.asarray(batch["codes"]), jnp.asarray(batch["ids"]), stats,
        jnp.asarray(model.level_mean), jnp.asarray(model.level_std), model.k,
    )
    for r, rd in enumerate(reads):
        spec = _spec_result(rd, model, CFG)
        L = len(rd.window_codes)
        got = np.asarray(ll[r, :L])
        want = spec["base_loglik"]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2,
                                   err_msg=f"base loglik mismatch read {r}")
        # calls must agree exactly
        np.testing.assert_array_equal(
            got.argmax(axis=1), want.argmax(axis=1),
            err_msg=f"call mismatch read {r}",
        )
