"""Multi-device data-parallel pipeline: shard_map over a read axis + psum merge.

This is the rebuild's distributed layer (SURVEY.md §2.2/§2.3 — the reference
has NO distributed anything; the spec here comes from BASELINE.json's north
star): read batches are sharded over the ``data`` mesh axis, every device runs
the identical banded-DP + rescoring program on its shard, and the per-locus
log-likelihood accumulators merge with a single ``psum`` over ICI — the only
cross-device communication in the whole pipeline.

Accumulator layouts:
  * replicated (default): every device holds (G, 4); one psum per batch.
  * genome-sharded (config 4, large G): each device keeps only its G/n slice;
    the batch's contribution is merged by ``psum_scatter`` along the genome
    axis, so no device ever materializes the full accumulator.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import AlignConfig
from ..ops import banded_dp, pallas_dp


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _local_compute(x, t_len, mu, sigma, n_ref, lo, delta, codes, ids,
                   level_mean, level_std, cfg: AlignConfig, backend: str):
    """Per-device slice of the batch: DP → stats → base log-likelihoods."""
    if backend == "pallas":
        res, _ = pallas_dp.pallas_viterbi_batch(
            x, t_len, mu, sigma, n_ref, lo, delta, cfg
        )
    else:
        T = x.shape[1]
        C = cfg.signal_chunk
        lo_full = jnp.repeat(lo, C, axis=1)[:, :T]
        res = banded_dp.banded_viterbi_batch(x, t_len, mu, sigma, n_ref, lo_full, cfg)
    if cfg.snp_rescore == "local":
        base_ll = banded_dp.base_loglik_local_batch(
            x, res.path, t_len, codes, ids, level_mean, level_std,
            cfg.k, cfg, t_w=cfg.snp_local_window,
        )
    else:
        stats = banded_dp.segment_stats_batch(res.path, x, t_len, mu.shape[1])
        base_ll = banded_dp.base_loglik_batch(
            codes, ids, stats, level_mean, level_std, cfg.k
        )
    return res.score, res.path, base_ll


def _scatter_accumulate(base_ll, wstart, wlen, strand, G, cfg: AlignConfig):
    """Local scatter-add of one shard's windows into fresh (G,4)/(G,) deltas.

    Same clipping + confident-vote semantics as call.accumulate_batch (the
    single-device path) so both aggregation paths produce identical state.
    """
    R, L, _ = base_ll.shape
    li = jnp.arange(L, dtype=jnp.int32)[None, :]
    rev = strand[:, None] < 0
    pos = jnp.where(rev, wstart[:, None] + wlen[:, None] - 1 - li, wstart[:, None] + li)
    valid = (li < wlen[:, None]) & (pos >= 0) & (pos < G)
    pos_safe = jnp.where(valid, pos, G)
    comp = jnp.asarray([3, 2, 1, 0], jnp.int32)
    ll_raw = jnp.where(rev[:, :, None], base_ll[:, :, comp], base_ll)
    ll = jnp.clip(ll_raw, -cfg.snp_ll_clip, cfg.snp_ll_clip)
    ll = jnp.where(valid[:, :, None], ll, 0.0)
    flat = pos_safe.reshape(-1)
    dacc = jnp.zeros((G + 1, 4), jnp.float32).at[flat].add(ll.reshape(-1, 4))[:G]
    dcov = jnp.zeros((G + 1,), jnp.int32).at[flat].add(
        valid.reshape(-1).astype(jnp.int32)
    )[:G]
    best = jnp.argmax(ll_raw, axis=2)
    best_v = jnp.max(ll_raw, axis=2)
    second = jnp.sort(ll_raw, axis=2)[:, :, 2]
    confident = (best_v - second >= cfg.snp_vote_margin) & valid
    onehot = jax.nn.one_hot(best, 4, dtype=jnp.int32) * confident[..., None]
    dvotes = jnp.zeros((G + 1, 4), jnp.int32).at[flat].add(onehot.reshape(-1, 4))[:G]
    return dacc, dcov, dvotes


def make_sharded_step(
    mesh: Mesh,
    cfg: AlignConfig,
    genome_len: int,
    backend: str = "scan",
    genome_sharded: bool = False,
):
    """Build the jitted multi-device align+accumulate step.

    Signature of the returned fn (leading dims sharded over the data axis;
    acc/cov replicated, or genome-sharded when genome_sharded=True):

      step(x, t_len, mu, sigma, n_ref, lo, delta, codes, ids,
           wstart, wlen, strand, level_mean, level_std, acc, cov, votes)
        -> (score, path, base_ll, acc, cov, votes)
    """
    axis = cfg.data_axis
    G = genome_len
    n_dev = mesh.devices.size

    data = P(axis)
    repl = P()
    acc_spec = P(axis) if genome_sharded else repl

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(data,) * 12 + (repl, repl, acc_spec, acc_spec, acc_spec),
        out_specs=(data, data, data, acc_spec, acc_spec, acc_spec),
        check_vma=False,
    )
    def step(x, t_len, mu, sigma, n_ref, lo, delta, codes, ids,
             wstart, wlen, strand, level_mean, level_std, acc, cov, votes):
        score, path, base_ll = _local_compute(
            x, t_len, mu, sigma, n_ref, lo, delta, codes, ids,
            level_mean, level_std, cfg, backend,
        )
        dacc, dcov, dvotes = _scatter_accumulate(
            base_ll, wstart, wlen, strand, G, cfg
        )
        if genome_sharded:
            # each device keeps its genome slice of the merged contribution
            dacc = jax.lax.psum_scatter(
                dacc.reshape(n_dev, G // n_dev, 4), axis, scatter_dimension=0,
                tiled=False,
            )
            dcov = jax.lax.psum_scatter(
                dcov.reshape(n_dev, G // n_dev), axis, scatter_dimension=0,
                tiled=False,
            )
            dvotes = jax.lax.psum_scatter(
                dvotes.reshape(n_dev, G // n_dev, 4), axis, scatter_dimension=0,
                tiled=False,
            )
        else:
            dacc = jax.lax.psum(dacc, axis)
            dcov = jax.lax.psum(dcov, axis)
            dvotes = jax.lax.psum(dvotes, axis)
        return score, path, base_ll, acc + dacc, cov + dcov, votes + dvotes

    return jax.jit(step, donate_argnums=(14, 15, 16))


def make_accumulators_sharded(mesh: Mesh, cfg: AlignConfig, genome_len: int,
                              genome_sharded: bool = False):
    """Device accumulators with the right sharding for make_sharded_step."""
    spec = P(cfg.data_axis) if genome_sharded else P()
    sh = NamedSharding(mesh, spec)
    acc = jax.device_put(jnp.zeros((genome_len, 4), jnp.float32), sh)
    cov = jax.device_put(jnp.zeros((genome_len,), jnp.int32), sh)
    votes = jax.device_put(jnp.zeros((genome_len, 4), jnp.int32), sh)
    return acc, cov, votes


def shard_batch_arrays(mesh: Mesh, cfg: AlignConfig, arrays: dict):
    """device_put batch arrays with leading-dim sharding over the data axis."""
    sh = NamedSharding(mesh, P(cfg.data_axis))
    return {k: jax.device_put(v, sh) for k, v in arrays.items()}
