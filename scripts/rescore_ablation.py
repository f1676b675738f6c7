"""Rescore-stage ablation on the real chip (VERDICT r4 next-round task 2).

The device step is rescore-dominated (12.4 of 24.8 ms at bench shapes), and
round 4 gave the FILL kernel an honest ablation round but not this stage.
Three parts, one run:

1. Sub-stage profile: path-counts kernel, shear gather, window derivation,
   and the hypothesis-DP kernel, timed in isolation at bench shapes.
2. Knob sweep on the DP kernel: sublane tile rt ∈ {8, 16, 32} × loop
   unroll2 ∈ {off, on} — both exact (interpret-mode parity asserted in
   tests), mirroring the fill kernel's read_tile result (+13% at wider
   tiles, BASELINE.md 2026-08-21).
3. Screen-fraction measurement: what fraction of (read, position) cells
   could a screen-then-rescore split skip, IF fixed-path deltas predicted
   post-clip coldness. NOTE (round 5): they do not — the premise is
   REFUTED by scripts/screen_refutation.py (realignment rescues reach
   thousands of nats and 4-6% of screened cells diverge post-clip); this
   part stays only as the candidate-win side of that ledger.

Run solo on the chip (never while pytest runs — the 2-core host skews
dispatch): python scripts/rescore_ablation.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from nadavca_tpu.ops import banded_dp, pallas_dp, pallas_rescore


def _sync(out):
    jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "block_until_ready") else a, out)


def timeit(name, f, *args, k=8):
    out = f(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [f(*args) for _ in range(k)]
        _sync(outs[-1])
        best = min(best, (time.time() - t0) / k)
    print(f"{name:>42}: {best*1e3:8.2f} ms", flush=True)
    return out, best


def main():
    from nadavca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg, model, protos, w, tables, genome = bench.build_workload()
    lm = jnp.asarray(model.level_mean)
    ls = jnp.asarray(model.level_std)
    a = {k: jnp.asarray(v) for k, v in w.items()}
    t_w = cfg.snp_local_window
    k = cfg.k

    # the production path array (device-resident input to every sub-stage)
    def path_of(x, t_len, mu, sigma, n_ref, lo, delta):
        res, _ = pallas_dp.pallas_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo, delta, cfg)
        return res.path

    path = jax.device_put(jax.jit(path_of)(
        a["x"], a["t_len"], a["mu"], a["sigma"], a["n_ref"], a["lo"],
        a["delta"]))

    R, T = w["x"].shape
    L_in = w["codes"].shape[1]
    L = -(-L_in // pallas_rescore.LT) * pallas_rescore.LT
    N = w["ids"].shape[1]
    Np = -(-(N + 1) // 128) * 128

    # ---- 1. sub-stage isolation --------------------------------------------
    def counts_only(x, path, t_len):
        tmask = jnp.arange(T)[None, :] < t_len[:, None]
        path_safe = jnp.where(tmask, path, Np)
        return pallas_rescore.path_counts_pallas(path_safe, Np, t_len=t_len)

    cnt, dt_counts = timeit("path-counts kernel", jax.jit(counts_only),
                            a["x"], path, a["t_len"])

    # window derivation (S/E/W pads + slab masks) up to the shear input
    def derive(cnt, path, t_len):
        i_idx = jnp.arange(L, dtype=jnp.int32)[None, :]
        s_row = cnt[:, :N]
        S = jnp.pad(s_row, ((0, 0), (k - 1, max(L - N - (k - 1), 0))),
                    mode="edge")[:, :L]
        e_row = cnt[:, 1: N + 1]
        E = jnp.pad(e_row, ((0, 0), (0, max(L - N, 0))), mode="edge")[:, :L]
        W = jnp.clip(E - S, 0, t_w)
        return S, W

    (S, W), dt_derive = timeit("window derive (XLA)", jax.jit(derive),
                               cnt, path, a["t_len"])

    span = 2048
    S_c = jnp.clip(S, 0, T - 1)

    def shear_only(x, S_c):
        return pallas_rescore.shear_gather_pallas(x, S_c, t_w, span=span)

    xs, dt_shear = timeit("shear gather kernel", jax.jit(shear_only),
                          a["x"], S_c)

    # DP kernel alone (tables variant, production configuration)
    codes_p = jnp.pad(a["codes"], ((0, 0), (0, L - L_in)),
                      constant_values=4)
    i_idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    kk = jnp.minimum(jnp.clip(i_idx, 0, N - 1)
                     - jnp.clip(i_idx - k + 1, 0, N - 1) + 1, k)
    kk = jnp.broadcast_to(kk, (R, L))
    xs_d = jax.device_put(xs)
    W_d = jax.device_put(W.astype(jnp.int32))

    results = {}
    for rt in (8, 16, 32):
        for unroll2 in (False, True):
            def dp_only(xs, W, kk, codes, woff, rt=rt, unroll2=unroll2):
                return pallas_rescore.rescore_fill_tab_pallas(
                    xs, W, kk, jnp.clip(codes, 0, 3), woff, tables.tab4,
                    cfg, t_w, rt=rt, unroll2=unroll2).sum(axis=(1, 2))

            name = f"hypothesis-DP kernel rt={rt} unroll2={int(unroll2)}"
            try:
                _, dt = timeit(name, jax.jit(dp_only), xs_d, W_d, kk,
                               codes_p, a["woff"])
                results[(rt, unroll2)] = dt
            except Exception as e:
                print(f"{name:>42}: FAILED {type(e).__name__}: {e}",
                      flush=True)

    # full rescore (production entry, default knobs) for the share math
    def full(x, path, t_len, codes, ids, woff):
        return pallas_rescore.base_loglik_local_pallas(
            x, path, t_len, codes, ids, lm, ls, k, cfg, t_w=t_w,
            tables_tab=tables.tab4, tables_valid=tables.valid,
            window_off=woff).sum(axis=(1, 2))

    _, dt_full = timeit("full rescore (production)", jax.jit(full),
                        a["x"], path, a["t_len"], a["codes"], a["ids"],
                        a["woff"])

    dt_dp = results.get((8, False))
    print()
    print(f"sum of isolated parts: "
          f"{(dt_counts + dt_derive + dt_shear + (dt_dp or 0))*1e3:.2f} ms "
          f"vs full {dt_full*1e3:.2f} ms")
    best = min(results, key=results.get)
    print(f"best DP variant: rt={best[0]} unroll2={int(best[1])} "
          f"at {results[best]*1e3:.2f} ms "
          f"(default {1e3*(dt_dp or float('nan')):.2f} ms)")

    # ---- 3. screen fraction ------------------------------------------------
    # fixed-path deltas are the cheap screen; a position is skippable when
    # every alt is already below -(clip + margin), where the exact DP's
    # answer would clip to -clip regardless.
    def fixed_deltas(x, path, t_len, codes, ids):
        stats = banded_dp.segment_stats_batch(path, x, t_len, N)
        return banded_dp.base_loglik_batch(codes, ids, stats, lm, ls, k)

    fd = np.asarray(jax.jit(fixed_deltas)(
        a["x"], path, a["t_len"], a["codes"], a["ids"]))   # (R, L, 4)
    live = np.asarray(w["codes"]) < 4
    best_alt = np.where(fd == 0.0, -np.inf, fd).max(axis=2)  # ref col is 0
    clip = cfg.snp_ll_clip
    n_live = max(int(live.sum()), 1)
    print()
    for margin in (0.0, 10.0, 25.0, 50.0):
        frac_keep = float(((best_alt > -(clip + margin)) & live).sum()) / n_live
        print(f"screen margin {margin:5.1f}: must-rescore fraction "
              f"{frac_keep:6.3f}  (skippable {1-frac_keep:6.3f})", flush=True)


if __name__ == "__main__":
    main()
