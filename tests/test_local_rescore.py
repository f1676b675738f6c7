"""Restricted local re-DP rescoring: batched JAX vs numpy spec."""

import numpy as np
import jax.numpy as jnp
import pytest

from nadavca_tpu.config import AlignConfig
from nadavca_tpu.genome import kmer_ids
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import banded_dp, dp_spec

CFG = AlignConfig()


def test_local_batch_matches_spec():
    rng = np.random.default_rng(42)
    model = default_model()
    genome = random_genome(rng, length=1500)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=ln, strand=1, mean_dwell=8.0)
        for ln in (150, 220, 180)
    ]
    R = len(reads)
    T = max(len(r.signal) for r in reads)
    L = max(len(r.window_codes) for r in reads)
    N = L - model.k + 1
    x = np.zeros((R, T), np.float32)
    t_len = np.zeros(R, np.int32)
    codes = np.full((R, L), 4, np.int32)
    ids = np.full((R, N), -1, np.int32)
    paths = np.zeros((R, T), np.int32)
    for r, rd in enumerate(reads):
        t = len(rd.signal)
        x[r, :t] = rd.signal
        t_len[r] = t
        lw = len(rd.window_codes)
        codes[r, :lw] = rd.window_codes
        nn = lw - model.k + 1
        ids[r, :nn] = kmer_ids(rd.window_codes, model.k)
        paths[r, :t] = rd.true_path
        paths[r, t:] = rd.true_path[-1]

    ll = np.asarray(banded_dp.base_loglik_local_batch(
        jnp.asarray(x), jnp.asarray(paths), jnp.asarray(t_len),
        jnp.asarray(codes), jnp.asarray(ids),
        jnp.asarray(model.level_mean), jnp.asarray(model.level_std),
        model.k, CFG, t_w=CFG.snp_local_window,
    ))
    for r, rd in enumerate(reads):
        spec = dp_spec.base_substitution_loglik_local(
            rd.window_codes, rd.true_path, rd.signal.astype(np.float64),
            model.level_mean.astype(np.float64),
            model.level_std.astype(np.float64),
            model.k, CFG, max_window=CFG.snp_local_window,
        )
        lw = len(rd.window_codes)
        got = ll[r, :lw]
        # f32 vs f64 on quadratic terms: relative tolerance
        np.testing.assert_allclose(got, spec, rtol=5e-3, atol=5e-2)
        np.testing.assert_array_equal(got.argmax(1), spec.argmax(1))
        # padded tail contributes nothing
        assert np.abs(ll[r, lw:]).sum() == 0


def test_local_rescore_unbiased_at_snp():
    """A read simulated with base X aligned against a reference with base Y
    must vote X at that site (the fixed-path rescore fails this — that bias is
    why the local re-DP exists; reference per SURVEY.md §3.4 re-runs a
    restricted DP)."""
    rng = np.random.default_rng(7)
    model = default_model()
    genome = random_genome(rng, length=400)
    window = genome["ref"].codes.copy()
    x, true_path = dp_spec_sim = __import__(
        "nadavca_tpu.io.simulator", fromlist=["simulate_squiggle"]
    ).simulate_squiggle(window, model, rng, mean_dwell=9.0, noise_scale=0.8)
    pos = 200
    true_base = int(window[pos])
    mutated = window.copy()
    mutated[pos] = (true_base + 1) % 4
    mu, sigma = model.expected_signal(mutated)
    lo = dp_spec.make_band(true_path.astype(np.float64), len(mu), CFG.band_width)
    _, path = dp_spec.banded_viterbi(
        x, mu.astype(np.float64), sigma.astype(np.float64), lo, CFG
    )
    ll = dp_spec.base_substitution_loglik_local(
        mutated, path, x, model.level_mean.astype(np.float64),
        model.level_std.astype(np.float64), model.k, CFG,
    )
    assert int(np.argmax(ll[pos])) == true_base, f"ll[{pos}] = {ll[pos]}"
