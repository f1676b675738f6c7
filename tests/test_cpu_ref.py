"""Native C++ CPU core vs the numpy float64 spec."""

import shutil

import numpy as np
import pytest

from nadavca_tpu.config import AlignConfig
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import dp_spec

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")

CFG = AlignConfig()


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(6)
    model = default_model()
    genome = random_genome(rng, length=1200)
    read = simulate_read(genome, "ref", model, rng, read_len=400, strand=1,
                         mean_dwell=8.0)
    mu, sigma = model.expected_signal(read.window_codes)
    lo = dp_spec.make_band(read.true_path.astype(np.float64), len(mu),
                           CFG.band_width).astype(np.int32)
    return model, read, mu, sigma, lo


def test_viterbi_matches_spec(case):
    from nadavca_tpu.ops import cpu_ref

    model, read, mu, sigma, lo = case
    score_c, path_c = cpu_ref.banded_viterbi_cpu(
        read.signal.astype(np.float32), mu, sigma, lo, CFG.band_width,
        CFG.log_p_stay, CFG.log_p_move,
    )
    score_s, path_s = dp_spec.banded_viterbi(
        read.signal, mu.astype(np.float64), sigma.astype(np.float64),
        lo.astype(np.int64), CFG,
    )
    assert np.isclose(score_c, score_s, rtol=1e-4, atol=0.05)
    assert np.mean(path_c == path_s) > 0.999


def test_local_rescore_matches_spec(case):
    from nadavca_tpu.ops import cpu_ref

    model, read, mu, sigma, lo = case
    ll_c = cpu_ref.base_loglik_local_cpu(
        read.signal.astype(np.float32), read.window_codes.astype(np.int32),
        read.true_path.astype(np.int32), model.level_mean, model.level_std,
        model.k, CFG.log_p_stay, CFG.log_p_move, CFG.snp_local_window,
    )
    ll_s = dp_spec.base_substitution_loglik_local(
        read.window_codes, read.true_path, read.signal.astype(np.float64),
        model.level_mean.astype(np.float64), model.level_std.astype(np.float64),
        model.k, CFG, max_window=CFG.snp_local_window,
    )
    np.testing.assert_allclose(ll_c, ll_s, rtol=5e-3, atol=5e-2)
    np.testing.assert_array_equal(ll_c.argmax(1), ll_s.argmax(1))
