"""Isolate the per-batch collective cost of the sharded SNP step (VERDICT r4
next-round task 5).

The round-4 weak-scaling proxy (two OS processes on a 2-core host, 0.76 at
N=2) measured host contention, not collective overhead. This isolates the
collective properly on the virtual 8-device CPU mesh: the SAME local compute
(scan backend, identical shapes) runs under three merge modes —

  none          each device returns its raw local accumulator contribution
                (no cross-device communication at all)
  psum          replicated accumulators, one psum per array (production
                default for small genomes)
  psum_scatter  genome-sharded accumulators (production config-4 path)

Identical compute + mesh across modes means (mode − none) is the collective
cost as XLA schedules it. CPU-mesh collectives are shared-memory copies, so
the measured delta is a LOWER bound on wire cost; the analytic extrapolation
below converts the known payload bytes to ICI/DCN time at published
bandwidths — that, not the CPU delta, is the number to compare against the
per-batch compute wall.

Run on CPU (never while chip work runs — 2-core host):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/collective_overhead.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

# this measurement is CPU-mesh only by design — force it regardless of the
# session's platform env (the axon plugin exports its own JAX_PLATFORMS)
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# this sandbox presets JAX_PLATFORMS=axon (remote TPU tunnel); the env
# overwrite alone is not enough once the plugin is registered — mirror
# tests/conftest.py and update the config after import too
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from nadavca_tpu import call as callmod
from nadavca_tpu import pipeline as pipelinemod
from nadavca_tpu.config import AlignConfig
from nadavca_tpu.parallel import sharded

# big enough that the collective payload is production-scale (config 4:
# G = 4.6 Mb), small enough that the CPU scan DP finishes quickly
G = 4_608_000
R = 16            # reads per global batch (2 per device)
READ_LEN = 400    # bases; T ≈ dwell · len


def build_batch(cfg, model, rng):
    from nadavca_tpu.genome import kmer_ids
    from nadavca_tpu.io.simulator import random_genome, simulate_read
    from nadavca_tpu.sched import build_chunked_bands

    genome = random_genome(rng, length=8000)
    protos = [simulate_read(genome, "ref", model, rng, read_len=READ_LEN,
                            strand=1, mean_dwell=9.0) for _ in range(4)]
    T = ((max(len(p.signal) for p in protos) + cfg.signal_chunk - 1)
         // cfg.signal_chunk * cfg.signal_chunk)
    L = max(len(p.window_codes) for p in protos)
    N = L - model.k + 1
    x = np.zeros((R, T), np.float32)
    t_len = np.zeros(R, np.int32)
    mu = np.zeros((R, N), np.float32)
    sigma = np.ones((R, N), np.float32)
    n_ref = np.zeros(R, np.int32)
    anchors = np.zeros((R, T), np.float64)
    codes = np.full((R, L), 4, np.int32)
    ids = np.full((R, N), -1, np.int32)
    wstart = np.zeros(R, np.int32)
    wlen = np.zeros(R, np.int32)
    strand = np.ones(R, np.int32)
    for r in range(R):
        p = protos[r % len(protos)]
        t = len(p.signal)
        x[r, :t] = p.signal
        t_len[r] = t
        m, s = model.expected_signal(p.window_codes)
        mu[r, :len(m)] = m
        sigma[r, :len(m)] = s
        n_ref[r] = len(m)
        anchors[r, :t] = p.true_path
        anchors[r, t:] = p.true_path[-1]
        codes[r, :len(p.window_codes)] = p.window_codes
        ids[r, :len(m)] = kmer_ids(p.window_codes, model.k)
        # scatter the windows across the big genome so the accumulator
        # contribution is NOT concentrated in one slice
        wstart[r] = int(rng.integers(0, G - L - 1))
        wlen[r] = len(p.window_codes)
    bands = build_chunked_bands(anchors, t_len, n_ref, cfg.band_width,
                                cfg.signal_chunk)
    lm = np.asarray(model.level_mean, np.float32)
    ls = np.asarray(model.level_std, np.float32)
    return dict(x=x, t_len=t_len, mu=mu, sigma=sigma, n_ref=n_ref,
                lo=bands.lo, delta=bands.delta, codes=codes, ids=ids,
                lm=lm, ls=ls), wstart, wlen, strand


def make_step(mesh, cfg, merge: str, k: int):
    axis = cfg.data_axis
    n_dev = mesh.devices.size
    data = P(axis)
    repl = P()
    acc_spec = {"none": data, "psum": repl, "psum_scatter": data}[merge]
    array_keys = ["x", "t_len", "mu", "sigma", "n_ref", "lo", "delta",
                  "codes", "ids", "lm", "ls"]
    staged_specs = {k2: sharded._spec_for(k2, axis) for k2 in array_keys}

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(staged_specs, data, data, data),
        out_specs=(data, acc_spec, acc_spec, acc_spec),
        check_vma=False,
    )
    def step(staged, wstart, wlen, strand):
        a = {k2: staged.get(k2) for k2 in array_keys}
        score, _path, base_ll = pipelinemod.device_compute(
            a["x"], a["t_len"], a["mu"], a["sigma"], a["n_ref"], a["lo"],
            a["delta"], None, None, a["codes"], a["ids"], a["lm"], a["ls"],
            None, None, None, cfg=cfg, backend="scan", k=k, interpret=False)
        flat, ll, n_valid, onehot = callmod.scatter_values(
            base_ll, wstart, wlen, strand, G, cfg)
        dacc = jnp.zeros((G + 1, 4), jnp.float32).at[flat].add(ll)[:G]
        dcov = jnp.zeros((G + 1,), jnp.int32).at[flat].add(n_valid)[:G]
        dvotes = jnp.zeros((G + 1, 4), jnp.int32).at[flat].add(onehot)[:G]
        if merge == "psum":
            dacc = jax.lax.psum(dacc, axis)
            dcov = jax.lax.psum(dcov, axis)
            dvotes = jax.lax.psum(dvotes, axis)
        elif merge == "psum_scatter":
            dacc = jax.lax.psum_scatter(
                dacc.reshape(n_dev, G // n_dev, 4), axis,
                scatter_dimension=0, tiled=False)
            dcov = jax.lax.psum_scatter(
                dcov.reshape(n_dev, G // n_dev), axis,
                scatter_dimension=0, tiled=False)
            dvotes = jax.lax.psum_scatter(
                dvotes.reshape(n_dev, G // n_dev, 4), axis,
                scatter_dimension=0, tiled=False)
        # merge == "none": raw local contribution, no communication
        return score, dacc, dcov, dvotes

    return jax.jit(step)


def timeit(f, args, n=6):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / n)
    return best


def main():
    from nadavca_tpu.kmer_model import default_model

    rng = np.random.default_rng(3)
    cfg = AlignConfig()
    model = default_model()
    mesh = sharded.make_mesh()
    n_dev = mesh.devices.size
    print(f"mesh: {n_dev} devices ({jax.devices()[0].platform})", flush=True)
    arrays, wstart, wlen, strand = build_batch(cfg, model, rng)
    staged = sharded.shard_staged(mesh, cfg, arrays)
    sh = NamedSharding(mesh, P(cfg.data_axis))
    ws = jax.device_put(wstart, sh)
    wl = jax.device_put(wlen, sh)
    st = jax.device_put(strand, sh)

    results = {}
    for merge in ("none", "psum", "psum_scatter"):
        f = make_step(mesh, cfg, merge, model.k)
        dt = timeit(f, (staged, ws, wl, st))
        results[merge] = dt
        print(f"{merge:>14}: {dt*1e3:8.2f} ms/batch", flush=True)

    base = results["none"]
    # payload: what the collective actually moves per batch
    acc_b = G * 4 * 4          # f32 (G, 4)
    cov_b = G * 4              # i32 (G,)
    votes_b = G * 4 * 4        # i32 (G, 4)
    payload = acc_b + cov_b + votes_b
    print()
    print(f"payload per batch: {payload/1e6:.1f} MB "
          f"(acc {acc_b/1e6:.1f} + cov {cov_b/1e6:.1f} + votes {votes_b/1e6:.1f})")
    for merge in ("psum", "psum_scatter"):
        d = results[merge] - base
        print(f"{merge:>14}: collective delta {d*1e3:+8.2f} ms/batch "
              f"on the CPU mesh (shared-memory copies — lower bound)")
    # analytic wire-time extrapolation. All-reduce (psum) moves
    # 2·(n-1)/n · payload per device; reduce-scatter (psum_scatter) half
    # that. Bandwidths: v5e ICI ~45 GB/s/link/direction (1 axis),
    # DCN ~ 6.25 GB/s/host (50 Gbps NIC) — conservative public figures.
    for name, bw in (("ICI 45 GB/s", 45e9), ("DCN 6.25 GB/s", 6.25e9)):
        ar = 2 * (n_dev - 1) / n_dev * payload / bw
        rs = (n_dev - 1) / n_dev * payload / bw
        print(f"  extrapolated wire time @ {name}: "
              f"psum {ar*1e3:.2f} ms, psum_scatter {rs*1e3:.2f} ms per batch")
    print()
    print("interpretation: compare wire time against the per-batch device "
          "compute wall (24-28 ms at bench shapes, BASELINE.md); the "
          "collective is amortized over batches of reads, and batches per "
          "accumulator merge can be raised to amortize further.")


if __name__ == "__main__":
    main()
