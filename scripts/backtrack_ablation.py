"""Backtrack-stage ablation on the real chip (round 5).

The device step is fill 8.9 + backtrack ~5.3 + rescore 11.6 ms at bench
shapes; fill and rescore both have ablation-backed walls (BASELINE.md).
This isolates the backtrack's two halves:

1. the one-hot-walk Pallas kernel (_advbits_kernel) — emits packed advance
   bits per 32-sample word;
2. the XLA epilogue — unpack bits to (R, T), reverse-cumsum the band-slot
   walk, materialize path = lo + j (three ~20 MB integer passes).

Run solo on the chip: python scripts/backtrack_ablation.py
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
from nadavca_tpu.ops import pallas_dp


def _sync(out):
    # block_until_ready does not reliably wait through the axon tunnel —
    # a host fetch is the true sync (same convention as cli.py / bench.py)
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)


def timeit(name, f, *args, k=8):
    out = f(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [f(*args) for _ in range(k)]
        _sync(outs[-1])
        best = min(best, (time.time() - t0) / k)
    print(f"{name:>34}: {best*1e3:8.2f} ms", flush=True)
    return out, best


def main():
    from nadavca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg, model, protos, w, tables, genome = bench.build_workload()
    a = {k: jnp.asarray(v) for k, v in w.items()}

    def fill_and_score(x, t_len, mu, sigma, n_ref, lo, delta):
        res, decs = pallas_dp.pallas_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo, delta, cfg)
        return res.score, res.final_j, decs

    # materialize the inputs for the isolated stages (one-time fetch cost,
    # outside any timing loop)
    score, j_end, decs = jax.jit(fill_and_score)(
        a["x"], a["t_len"], a["mu"], a["sigma"], a["n_ref"], a["lo"],
        a["delta"])
    decs = jax.device_put(tuple(np.asarray(d) for d in decs))
    j_end = jax.device_put(np.asarray(j_end))

    C = cfg.signal_chunk

    # timed fns return SCALAR reductions so the sync fetch is one float and
    # the tunnel transfer cost stays out of the measurement
    def bt_full(decs, lo, delta, j_end):
        p = pallas_dp.backtrack_pallas(decs, lo, delta, j_end, C)
        return jnp.sum(p, dtype=jnp.int64)

    _, dt_full = timeit("backtrack (kernel + epilogue)", jax.jit(bt_full),
                        decs, a["lo"], a["delta"], j_end)

    # kernel alone: reproduce backtrack_pallas's pallas_call, return advw
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Tw, R, B = decs[0].shape
    n_chunks = a["lo"].shape[1]
    wpc = C // 32

    def bt_kernel_only_raw(decs, delta, j_end):
        kernel = functools.partial(
            pallas_dp._advbits_kernel, n_words=Tw, chunk_size=C,
            band_width=B, r=R, use_skip=False)
        dl_cm = delta.T[:, :, None].astype(jnp.int32)
        dec_spec = pl.BlockSpec((wpc, R, B),
                                lambda g: (n_chunks - 1 - g, 0, 0),
                                memory_space=pltpu.VMEM)
        adv_spec = pl.BlockSpec((wpc, R, 1),
                                lambda g: (n_chunks - 1 - g, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(n_chunks,),
            in_specs=[dec_spec,
                      pl.BlockSpec((1, R, 1), lambda g: (n_chunks - 1 - g, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, 1), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[adv_spec],
            out_shape=[jax.ShapeDtypeStruct((Tw, R, 1), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((R, B), jnp.int32)],
        )(decs[0], dl_cm, j_end.reshape(R, 1).astype(jnp.int32))[0]

    def bt_kernel_only(decs, delta, j_end):
        return jnp.sum(bt_kernel_only_raw(decs, delta, j_end),
                       dtype=jnp.int64)

    _, dt_k = timeit("advbits kernel alone", jax.jit(bt_kernel_only),
                     decs, a["delta"], j_end)
    advw = jax.device_put(np.asarray(
        jax.jit(bt_kernel_only_raw)(decs, a["delta"], j_end)))

    def epilogue(advw, lo, delta, j_end):
        T = Tw * 32
        shifts = jnp.arange(32, dtype=jnp.int32)
        adv = ((advw[:, None, :, 0] >> shifts[None, :, None]) & 1)
        adv = adv.reshape(T, R).T.astype(jnp.int32)
        d_full = jnp.concatenate(
            [delta[:, :, None].astype(jnp.int32),
             jnp.zeros((R, n_chunks, C - 1), jnp.int32)], axis=2
        ).reshape(R, T)
        rc = jnp.cumsum((d_full - adv)[:, ::-1], axis=1)[:, ::-1]
        suffix = jnp.concatenate([rc[:, 1:], jnp.zeros((R, 1), jnp.int32)],
                                 axis=1)
        lo_rep = jnp.repeat(lo.astype(jnp.int32), C, axis=1)
        return jnp.sum(lo_rep + j_end[:, None].astype(jnp.int32) + suffix,
                       dtype=jnp.int64)

    _, dt_e = timeit("XLA epilogue alone", jax.jit(epilogue),
                     advw, a["lo"], a["delta"], j_end)
    print(f"\nkernel {dt_k*1e3:.2f} + epilogue {dt_e*1e3:.2f} "
          f"= {(dt_k+dt_e)*1e3:.2f} vs full {dt_full*1e3:.2f} ms")


if __name__ == "__main__":
    main()
