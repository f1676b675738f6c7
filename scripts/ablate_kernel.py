"""Ablation study of the fill kernel: which op eats the cycles?

Each variant strips one component; the delta vs baseline attributes cost.
Run on the real TPU: python scripts/ablate_kernel.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
R_TILE = 8
B = 128
C = 128

def set_rt(v):
    global R_TILE
    R_TILE = v


def make_kernel(variant: str):
    R_TILE_ = R_TILE
    def kernel(x_ref, mu_ref, sg_ref, dl_ref, dec_ref, vout_ref, v_scr):
        c = pl.program_id(1)
        mu = mu_ref[0]
        sg = sg_ref[0]
        dl_col = dl_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R_TILE, B), 1)
        em_const = -jnp.log(sg) - 0.918
        inv2v = 0.5 / (sg * sg)

        @pl.when(c == 0)
        def _():
            v_scr[:] = jnp.zeros((R_TILE, B), jnp.float32)

        @pl.when(c > 0)
        def _():
            if variant != "norealign":
                idx = lane + dl_col
                ok = idx < B
                vg = jnp.take_along_axis(v_scr[:], jnp.minimum(idx, B - 1), axis=1)
                v_scr[:] = jnp.where(ok, vg, NEG_INF)

        neg_col = jnp.full((R_TILE, 1), NEG_INF, jnp.float32)
        move_const = jnp.where(lane == 0, NEG_INF, -2.3)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        shift_mat = (row_i + 1 == col_i).astype(jnp.float32)

        def body(s, carry):
            v, pack = carry
            if variant == "nox":
                x_col = 1.0
            else:
                x_col = x_ref[:, pl.ds(s, 1)]
            diff = x_col - mu
            emit = em_const - diff * diff * inv2v
            stay = v + (-0.1)
            if variant == "noshift":
                move = v + (-2.3)
            elif variant == "roll":
                move = pltpu.roll(v, 1, axis=1) + move_const
            elif variant == "matmul":
                move = jnp.dot(v, shift_mat, preferred_element_type=jnp.float32) + move_const
            else:
                move = jnp.concatenate([neg_col, v[:, : B - 1]], axis=1) + (-2.3)
            bit = move > stay
            v = emit + jnp.maximum(stay, move)
            if variant != "nopack":
                pack = pack | (bit.astype(jnp.int32) << (s % 32))

                @pl.when(s % 32 == 31)
                def _():
                    dec_ref[pl.ds(s // 32, 1)] = pack.reshape(1, R_TILE, B)

                pack = jnp.where(s % 32 == 31, jnp.zeros_like(pack), pack)
            return v, pack

        v, _ = jax.lax.fori_loop(
            0, C, body, (v_scr[:], jnp.zeros((R_TILE, B), jnp.int32)), unroll=True
        )
        m = jnp.max(v, axis=1, keepdims=True)
        v_scr[:] = v - m
        vout_ref[:] = v - m

    return kernel


def run_variant(variant, R, T, N_dummy=None):
    n_chunks = T // C
    kernel = make_kernel(variant)
    grid = (R // R_TILE, n_chunks)
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R_TILE, C), lambda r, c: (r, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE, B), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE, B), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE, 1), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C // 32, R_TILE, B), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, B), lambda r, c: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T // 32, R, B), jnp.int32),
            jax.ShapeDtypeStruct((R, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((R_TILE, B), jnp.float32)],
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, T)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(n_chunks, R, B)).astype(np.float32))
    sg = jnp.asarray(np.full((n_chunks, R, B), 0.2, np.float32))
    dl = jnp.asarray(np.full((n_chunks, R, 1), 3, np.int32))
    g = jax.jit(lambda *a: f(*a)[1].sum())
    np.asarray(g(x, mu, sg, dl))
    K = 10
    t0 = time.time()
    outs = [g(x, mu, sg, dl) for _ in range(K)]
    np.asarray(outs[-1])
    dt = (time.time() - t0) / K
    cells = R * T * B
    print(f"{variant:>10}: {dt*1e3:7.2f} ms  {cells/dt/1e9:6.1f} Gcells/s", flush=True)


if __name__ == "__main__":
    import sys
    R, T = 256, 16384
    for rt in [64, 128]:
        set_rt(rt)
        try:
            run_variant(f"base(rt={rt})", R, T)
        except Exception as e:
            print(f"rt={rt}: FAIL {type(e).__name__} {str(e)[:150]}")
