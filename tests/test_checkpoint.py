"""Checkpoint/resume of accumulator state."""

import numpy as np

from nadavca_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_roundtrip(tmp_path):
    p = str(tmp_path / "state.npz")
    accs = {
        "chr1": (np.random.rand(100, 4).astype(np.float32),
                 np.random.randint(0, 9, 100).astype(np.int32)),
        "chr2": (np.random.rand(50, 4).astype(np.float32),
                 np.random.randint(0, 9, 50).astype(np.int32)),
    }
    save_checkpoint(p, accs, ["r1", "r2", "r2"])
    accs2, manifest = load_checkpoint(p)
    assert manifest == {"r1", "r2"}
    for n in accs:
        np.testing.assert_array_equal(accs2[n][0], accs[n][0])
        np.testing.assert_array_equal(accs2[n][1], accs[n][1])


def test_missing_is_empty(tmp_path):
    accs, manifest = load_checkpoint(str(tmp_path / "nope.npz"))
    assert accs == {} and manifest == set()


def test_overwrite_is_atomic(tmp_path):
    p = str(tmp_path / "state.npz")
    a1 = {"c": (np.zeros((10, 4), np.float32), np.zeros(10, np.int32))}
    save_checkpoint(p, a1, ["a"])
    a2 = {"c": (np.ones((10, 4), np.float32), np.ones(10, np.int32))}
    save_checkpoint(p, a2, ["a", "b"])
    accs, manifest = load_checkpoint(p)
    assert manifest == {"a", "b"}
    np.testing.assert_array_equal(accs["c"][0], a2["c"][0])
