"""Real-TPU smoke test of the Pallas fill kernel: compile + run + compare.

Run WITHOUT the test env vars (uses the axon TPU):
    python scripts/tpu_smoke.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nadavca_tpu.config import AlignConfig
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import pallas_dp
from nadavca_tpu.sched import build_chunked_bands


def main():
    print("devices:", jax.devices())
    cfg = AlignConfig(band_width=128, signal_chunk=128)
    rng = np.random.default_rng(7)
    model = default_model()
    genome = random_genome(rng, length=3000)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=250, strand=1, mean_dwell=8.0)
        for _ in range(8)
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
    bands = build_chunked_bands(anchors, t_len, n_ref, cfg.band_width, cfg.signal_chunk)

    args = (
        jnp.asarray(x), jnp.asarray(t_len), jnp.asarray(mu), jnp.asarray(sigma),
        jnp.asarray(n_ref), jnp.asarray(bands.lo), jnp.asarray(bands.delta),
    )
    t0 = time.time()
    res, decs = pallas_dp.pallas_viterbi_batch(*args, cfg, interpret=False)
    res.score.block_until_ready()
    print(f"compile+run: {time.time() - t0:.1f}s")
    print("scores:", np.asarray(res.score))

    # quick correctness: recovered paths close to simulated truth
    for r, rd in enumerate(reads[:3]):
        t = int(t_len[r])
        path = np.asarray(res.path[r, :t])
        err = np.abs(path - rd.true_path)
        print(f"read {r}: frac|err|<=2 = {np.mean(err <= 2):.4f}")

    # timing (steady state)
    for _ in range(2):
        t0 = time.time()
        res, decs = pallas_dp.pallas_viterbi_batch(*args, cfg, interpret=False)
        res.score.block_until_ready()
        dt = time.time() - t0
    cells = float(np.sum(t_len.astype(np.int64)) * cfg.band_width)
    print(f"fill+backtrack: {dt*1e3:.2f} ms  ({cells/dt/1e9:.2f} Gcells/s incl. backtrack)")


if __name__ == "__main__":
    main()
