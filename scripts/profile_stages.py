"""Per-stage timing of the e2e pipeline on the real TPU.

Splits the bench workload's jitted step into its stages (fill, backtrack,
segment stats, rescore) and times each in isolation + the fused whole, so
optimization effort goes where the wall-clock is (SURVEY §5 tracing row).

Run on the real chip: python scripts/profile_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from nadavca_tpu.ops import pallas_dp, pallas_rescore
from nadavca_tpu.sched.bands import ChunkedBands, gather_band_levels


def _sync(out):
    # block_until_ready does not reliably block through the axon tunnel —
    # a host fetch of every leaf is the only true sync
    jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "block_until_ready") else a, out)


def timeit(name, f, *args, k=8):
    out = f(*args)
    _sync(out)
    t0 = time.time()
    outs = [f(*args) for _ in range(k)]
    _sync(outs[-1])
    dt = (time.time() - t0) / k
    print(f"{name:>28}: {dt*1e3:8.2f} ms  ({bench.BATCH_READS/dt:8.1f} reads/s)",
          flush=True)
    return outs[0], dt


def main():
    from nadavca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg, model, protos, w, tables = bench.build_workload()
    lm = jnp.asarray(model.level_mean)
    ls = jnp.asarray(model.level_std)
    bands = ChunkedBands(lo=w["lo"], delta=w["delta"],
                         chunk_size=cfg.signal_chunk, band_width=cfg.band_width)
    mu_b, sg_b = gather_band_levels(w["mu"], w["sigma"], bands)
    mu_b = jnp.asarray(mu_b.transpose(1, 0, 2))
    sg_b = jnp.asarray(sg_b.transpose(1, 0, 2))
    a = {k: jnp.asarray(v) for k, v in w.items()}

    # 1. fill+backtrack (the pallas_viterbi_batch entry)
    def fill_bt(x, t_len, mu, sigma, n_ref, lo, delta, mub, sgb):
        res, dec = pallas_dp.pallas_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo, delta, cfg,
            mu_band=mub, sg_band=sgb)
        # reduce outputs so the sync fetch is tiny (tunnel fetch of the full
        # path array would dominate the measurement)
        return res.score.sum(), res.path.sum()

    _, dt_fillbt = timeit(
        "fill+backtrack", jax.jit(fill_bt),
        a["x"], a["t_len"], a["mu"], a["sigma"], a["n_ref"], a["lo"],
        a["delta"], mu_b, sg_b)

    # the path array itself (device-resident input for the rescore stage)
    def path_of(x, t_len, mu, sigma, n_ref, lo, delta, mub, sgb):
        res, _ = pallas_dp.pallas_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo, delta, cfg,
            mu_band=mub, sg_band=sgb)
        return res.path

    path = jax.jit(path_of)(
        a["x"], a["t_len"], a["mu"], a["sigma"], a["n_ref"], a["lo"],
        a["delta"], mu_b, sg_b)

    # 2. fill only (score without backtrack)
    def fill_only(x, t_len, mu, sigma, n_ref, lo, delta, mub, sgb):
        res, dec = pallas_dp.pallas_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo, delta, cfg,
            mu_band=mub, sg_band=sgb, with_path=False)
        return res.score

    try:
        _, dt_fill = timeit(
            "fill only", jax.jit(fill_only),
            a["x"], a["t_len"], a["mu"], a["sigma"], a["n_ref"], a["lo"],
            a["delta"], mu_b, sg_b)
    except TypeError:
        print("  (no backtrack=False knob; skipping fill-only)")
        dt_fill = None

    # 3. rescore, given the path (pt shadows the device path array)
    def rescore(x, pt, t_len, codes, ids, woff):
        path = pt
        out = pallas_rescore.base_loglik_local_pallas(
            x, path, t_len, codes, ids, lm, ls, cfg.k, cfg,
            t_w=cfg.snp_local_window,
            tables_tab=tables.tab4, tables_valid=tables.valid,
            window_off=a["woff"])
        return out.sum(axis=(1, 2))

    path = jax.device_put(path)
    _, dt_rescore = timeit(
        "rescore (tables)", jax.jit(rescore),
        a["x"], path, a["t_len"], a["codes"], a["ids"], a["woff"])

    # 4. the fused full step as bench runs it
    def full(x, t_len, mu, sigma, n_ref, lo, delta, codes, ids, woff, mub, sgb):
        res, _ = pallas_dp.pallas_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo, delta, cfg,
            mu_band=mub, sg_band=sgb)
        base_ll = pallas_rescore.base_loglik_local_pallas(
            x, res.path, t_len, codes, ids, lm, ls, cfg.k, cfg,
            t_w=cfg.snp_local_window,
            tables_tab=tables.tab4, tables_valid=tables.valid,
            window_off=woff)
        return res.score.sum(), base_ll.sum()

    _, dt_full = timeit(
        "full step (fused)", jax.jit(full),
        a["x"], a["t_len"], a["mu"], a["sigma"], a["n_ref"], a["lo"],
        a["delta"], a["codes"], a["ids"], a["woff"], mu_b, sg_b)

    print()
    if dt_fill is not None:
        print(f"backtrack share ≈ {(dt_fillbt-dt_fill)*1e3:.2f} ms")
    print(f"rescore share   ≈ {dt_rescore*1e3:.2f} ms")
    print(f"sum of parts    ≈ {(dt_fillbt+dt_rescore)*1e3:.2f} ms "
          f"vs full {dt_full*1e3:.2f} ms")


if __name__ == "__main__":
    main()
