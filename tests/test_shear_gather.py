"""Shear-via-MXU gather kernel: exact vs direct indexing (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from nadavca_tpu.ops.pallas_rescore import shear_gather_pallas, shear_slab_base


def test_shear_exact():
    rng = np.random.default_rng(0)
    R, T, L, tw, span = 8, 4608, 256, 64, 256
    x = rng.normal(size=(R, T)).astype(np.float32)
    S = np.zeros((R, L), np.int32)
    for r in range(R):
        S[r] = np.sort(rng.integers(0, 3000, size=L)).astype(np.int32)
    # keep every tile's spread within the aligned-slab budget
    for r in range(R):
        for lt in range(L // 128):
            tile = S[r, lt * 128:(lt + 1) * 128]
            tile[:] = np.clip(tile, tile.min(), tile.min() + span - 160)
    xs = np.asarray(shear_gather_pallas(
        jnp.asarray(x), jnp.asarray(S), tw, span=span, interpret=True))
    base = np.asarray(shear_slab_base(jnp.asarray(S), T, span))
    ref = np.zeros((tw, R, L), np.float32)
    for r in range(R):
        for i in range(L):
            ref[:, r, i] = x[r, S[r, i]:S[r, i] + tw]
    np.testing.assert_array_equal(xs, ref)
    # and the validity budget used by the caller holds for this fixture
    S_tiles = S.reshape(R, L // 128, 128)
    assert ((S_tiles - base[:, :, None]) <= span - 1).all()
