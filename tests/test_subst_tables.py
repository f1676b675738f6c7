"""Genome-level substituted-level tables vs per-read construction."""

import numpy as np
import jax.numpy as jnp
import pytest

from nadavca_tpu.anchor import SeedIndex
from nadavca_tpu.config import AlignConfig
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import pallas_rescore
from nadavca_tpu.ops.subst_tables import build_subst_tables
from nadavca_tpu.pipeline import assemble_batch, preprocess_read, align_batch

CFG = AlignConfig(read_tile=8)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(3)
    model = default_model()
    genome = random_genome(rng, length=1500)
    index = SeedIndex(genome)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=250,
                      strand=1 if i % 2 else -1)
        for i in range(8)
    ]
    records = [
        preprocess_read(r.signal.astype(np.float32), r.basecall, r.move_index,
                        index, genome, r.read_id, model=model)
        for r in reads
    ]
    records = [r for r in records if r is not None][:8]
    batch = assemble_batch(records, model, CFG, pad_reads_to=8)
    tables = build_subst_tables(genome, model)
    return model, genome, batch, tables


def test_table_path_matches_gather_path(world):
    model, genome, batch, tables = world
    x = jnp.asarray(batch.x)
    t_len = jnp.asarray(batch.t_len)
    out = align_batch(batch, model, CFG, backend="scan")
    path = out["path"]
    common = (x, path, t_len, jnp.asarray(batch.codes), jnp.asarray(batch.ids),
              jnp.asarray(model.level_mean), jnp.asarray(model.level_std))
    ref = np.asarray(pallas_rescore.base_loglik_local_pallas(
        *common, model.k, CFG, t_w=96, interpret=True))
    woff = tables.window_offsets(batch.contigs, batch.window_start,
                                 batch.window_len, batch.strand)
    got = np.asarray(pallas_rescore.base_loglik_local_pallas(
        *common, model.k, CFG, t_w=96, interpret=True,
        tables_tab=tables.tab4, tables_valid=tables.valid,
        window_off=jnp.asarray(woff)))
    k = model.k
    path_np = np.asarray(path)
    for r in range(batch.n_reads):
        lw = int(batch.window_len[r])
        t = int(batch.t_len[r])
        # interior = inside the path span with full k-windows (the table path
        # masks path-span edge positions to zero — documented approximation)
        first_pos = int(path_np[r, 0])
        last_pos = int(path_np[r, t - 1])
        interior = slice(first_pos + k, min(lw, last_pos) - k)
        np.testing.assert_allclose(got[r, interior], ref[r, interior],
                                   rtol=1e-5, atol=1e-3,
                                   err_msg=f"read {r} interior mismatch")
        # masked edges are exactly zero
        assert np.all(got[r, :first_pos + k - 1] == 0)


def test_window_offsets_roundtrip(world):
    """The sliced table rows must equal per-window recomputed levels."""
    model, genome, batch, tables = world
    woff = tables.window_offsets(batch.contigs, batch.window_start,
                                 batch.window_len, batch.strand)
    # mu is plane 1 of the stacked table; undo the 128-block split
    t4 = np.asarray(tables.tab4)
    mu_np = t4[1].reshape(t4.shape[1], -1)
    k = model.k
    from nadavca_tpu.genome import kmer_ids

    for r in range(min(4, batch.n_reads)):
        lw = int(batch.window_len[r])
        window = batch.codes[r, :lw].astype(np.int8)
        ids = kmer_ids(window, k)
        # tables are stored (k*4, rows) — slice columns, then restore (lw, k, 4)
        sl = mu_np[:, woff[r]:woff[r] + lw].T.reshape(lw, k, 4)
        for i in range(k, lw - k):  # interior
            for j in range(k):
                p = i - k + 1 + j
                for b in range(4):
                    nid = ids[p] + (b - int(window[i])) * (4 ** j)
                    want = model.level_mean[nid]
                    assert abs(sl[i, j, b] - want) < 1e-6, (r, i, j, b)
