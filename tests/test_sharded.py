"""Multi-device sharding: shard_map pipeline on the 8-device CPU mesh.

SURVEY.md §4 item 4: N-way sharded locus accumulators must merge to exactly
the 1-device result; genome-sharded (psum_scatter) and replicated (psum)
layouts must agree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nadavca_tpu.config import AlignConfig
from nadavca_tpu.genome import kmer_ids
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.parallel import sharded
from nadavca_tpu.pipeline import assemble_batch, align_batch, preprocess_read
from nadavca_tpu import call as callmod
from nadavca_tpu.anchor import SeedIndex

CFG = AlignConfig(read_tile=8)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(31)
    model = default_model()
    genome = random_genome(rng, length=2048)
    index = SeedIndex(genome)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=300,
                      strand=1 if i % 2 else -1)
        for i in range(16)
    ]
    records = [
        preprocess_read(r.signal.astype(np.float32), r.basecall, r.move_index,
                        index, genome, r.read_id)
        for r in reads
    ]
    records = [r for r in records if r is not None]
    batch = assemble_batch(records[:16], model, CFG, pad_reads_to=16)
    return model, genome, batch


def _batch_args(batch, model):
    lm = jnp.asarray(model.level_mean)
    ls = jnp.asarray(model.level_std)
    return dict(
        x=jnp.asarray(batch.x), t_len=jnp.asarray(batch.t_len),
        mu=jnp.asarray(batch.mu), sigma=jnp.asarray(batch.sigma),
        n_ref=jnp.asarray(batch.n_ref), lo=jnp.asarray(batch.bands.lo),
        delta=jnp.asarray(batch.bands.delta), codes=jnp.asarray(batch.codes),
        ids=jnp.asarray(batch.ids),
        wstart=jnp.asarray(batch.window_start),
        wlen=jnp.asarray(batch.window_len),
        strand=jnp.asarray(batch.strand),
    ), lm, ls


def _run(mesh_n, batch, model, genome, genome_sharded):
    G = len(genome["ref"])
    mesh = sharded.make_mesh(mesh_n, CFG.data_axis)
    step = sharded.make_sharded_step(mesh, CFG, G, backend="scan",
                                     genome_sharded=genome_sharded)
    acc, cov, votes = sharded.make_accumulators_sharded(mesh, CFG, G, genome_sharded)
    arrays, lm, ls = _batch_args(batch, model)
    arrays = sharded.shard_batch_arrays(mesh, CFG, arrays)
    score, path, base_ll, acc, cov, votes = step(
        arrays["x"], arrays["t_len"], arrays["mu"], arrays["sigma"],
        arrays["n_ref"], arrays["lo"], arrays["delta"], arrays["codes"],
        arrays["ids"], arrays["wstart"], arrays["wlen"], arrays["strand"],
        lm, ls, acc, cov, votes,
    )
    return (np.asarray(score), np.asarray(path), np.asarray(acc),
            np.asarray(cov), np.asarray(votes))


def test_sharded_matches_single_device(world):
    model, genome, batch = world
    s8, p8, acc8, cov8, v8 = _run(8, batch, model, genome, genome_sharded=False)
    s1, p1, acc1, cov1, v1 = _run(1, batch, model, genome, genome_sharded=False)
    np.testing.assert_allclose(s8, s1, rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(p8, p1)
    np.testing.assert_array_equal(cov8, cov1)
    np.testing.assert_array_equal(v8, v1)
    np.testing.assert_allclose(acc8, acc1, rtol=1e-4, atol=1e-2)


def test_genome_sharded_accumulators_match(world):
    model, genome, batch = world
    _, _, acc_r, cov_r, v_r = _run(8, batch, model, genome, genome_sharded=False)
    _, _, acc_s, cov_s, v_s = _run(8, batch, model, genome, genome_sharded=True)
    np.testing.assert_array_equal(cov_s, cov_r)
    np.testing.assert_array_equal(v_s, v_r)
    np.testing.assert_allclose(acc_s, acc_r, rtol=1e-4, atol=1e-2)


def test_sharded_matches_unsharded_pipeline(world):
    """The shard_map path must equal the plain single-process align_batch."""
    model, genome, batch = world
    out = align_batch(batch, model, CFG, backend="scan")
    s8, p8, _, _, _ = _run(8, batch, model, genome, genome_sharded=False)
    np.testing.assert_allclose(np.asarray(out["score"]), s8, rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out["path"]), p8)
