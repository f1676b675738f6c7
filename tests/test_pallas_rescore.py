"""Pallas rescore kernel (interpret mode) vs the XLA local re-DP."""

import numpy as np
import jax.numpy as jnp
import pytest

from nadavca_tpu.config import AlignConfig
from nadavca_tpu.genome import kmer_ids
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import banded_dp, pallas_rescore

CFG = AlignConfig()


def _mk(rng, model, lens, L):
    genome = random_genome(rng, length=1500)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=ln, strand=1,
                      mean_dwell=8.0)
        for ln in lens
    ]
    R = len(reads)
    T = max(len(r.signal) for r in reads)
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
        ids[r, : lw - model.k + 1] = kmer_ids(rd.window_codes, model.k)
        paths[r, :t] = rd.true_path
        paths[r, t:] = rd.true_path[-1]
    return (jnp.asarray(x), jnp.asarray(paths), jnp.asarray(t_len),
            jnp.asarray(codes), jnp.asarray(ids))


@pytest.mark.parametrize("L", [256, 200])  # aligned and unaligned L
def test_pallas_rescore_matches_xla(L):
    rng = np.random.default_rng(42)
    model = default_model()
    args = _mk(rng, model, (150, 190, 180, 175, 160, 185, 170, 165), L)
    lm = jnp.asarray(model.level_mean)
    ls = jnp.asarray(model.level_std)
    ref = np.asarray(banded_dp.base_loglik_local_batch(
        *args, lm, ls, model.k, CFG, t_w=CFG.snp_local_window))
    got = np.asarray(pallas_rescore.base_loglik_local_pallas(
        *args, lm, ls, model.k, CFG, t_w=CFG.snp_local_window, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(got.argmax(2), ref.argmax(2))


def test_pallas_rescore_odd_read_count():
    """R not a multiple of the tile (padding path)."""
    rng = np.random.default_rng(5)
    model = default_model()
    args = _mk(rng, model, (150, 180, 200), 256)
    lm = jnp.asarray(model.level_mean)
    ls = jnp.asarray(model.level_std)
    ref = np.asarray(banded_dp.base_loglik_local_batch(
        *args, lm, ls, model.k, CFG, t_w=96))
    got = np.asarray(pallas_rescore.base_loglik_local_pallas(
        *args, lm, ls, model.k, CFG, t_w=96, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)
