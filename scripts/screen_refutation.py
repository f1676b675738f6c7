"""Screen-then-rescore: the refutation measurement (round 5).

VERDICT r4 task 2 proposed restricting the hypothesis-DP kernel (9 of the
11.6 ms rescore stage) to positions where the cheap FIXED-PATH delta leaves
any alt above -(snp_ll_clip + margin) — elsewhere the exact local-DP answer
was presumed to clip to -snp_ll_clip in accumulate_batch anyway, making the
skip free. scripts/rescore_ablation.py measured the candidate win: 86-95%
of (read, position) cells "skippable" at margins 25-50.

This script measures the PREMISE, and refutes it. The exact local DP can
score a hypothesis far ABOVE its fixed-path value ("realignment rescue"):
the DP may shrink a mismatched k-mer's segment to a single sample and
redistribute the rest to its neighbors, which no fixed-segmentation
statistic anticipates. Measured on a realistic 8-read world (indels + pore
skips): rescues reach thousands of nats, their tail does NOT decay with the
margin, and ~4-6% of screened cells land ABOVE -clip — i.e. their
post-accumulate value would change, concentrated exactly in the near-clip
gray zone that decides calls. A sound screen needs an upper bound on the DP
value; the only cheap sound bound (per-sample max emission over window
slots) streams the same (em, mu, iv) operands that make the DP kernel
VMEM-stream-bound in the first place, capping any possible win below its
overheads. Full writeup: BASELINE.md "Rescore-stage ablation".

The fixed-path screen was prototyped in both backends (scan mirror +
compacted Pallas path with a tab-DMA screen kernel), measured, and REMOVED
— it silently perturbs the calling gray zone at any margin. This script
reproduces the refutation numbers from the shipped exact code paths.

Run: JAX_PLATFORMS=cpu python scripts/screen_refutation.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nadavca_tpu.anchor import SeedIndex
from nadavca_tpu.config import AlignConfig
from nadavca_tpu.io.simulator import random_genome, simulate_read
from nadavca_tpu.kmer_model import default_model
from nadavca_tpu.ops import banded_dp
from nadavca_tpu.pipeline import assemble_batch, preprocess_read, align_batch

CFG = AlignConfig(read_tile=8)
T_W = CFG.snp_local_window


def main():
    rng = np.random.default_rng(11)
    model = default_model()
    genome = random_genome(rng, length=1500)
    index = SeedIndex(genome)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=250,
                      strand=1 if i % 2 else -1, basecall_sub_rate=0.02,
                      basecall_ins_rate=0.02, basecall_del_rate=0.02,
                      skip_prob=0.03)
        for i in range(8)
    ]
    records = [
        preprocess_read(r.signal.astype(np.float32), r.basecall,
                        r.move_index, index, genome, r.read_id, model=model)
        for r in reads
    ]
    records = [r for r in records if r is not None][:8]
    batch = assemble_batch(records, model, CFG, pad_reads_to=8)
    out = align_batch(batch, model, CFG, backend="scan")
    x = jnp.asarray(batch.x)
    path = out["path"]
    t_len = jnp.asarray(batch.t_len)
    codes = jnp.asarray(batch.codes)
    ids = jnp.asarray(batch.ids)
    lm = jnp.asarray(model.level_mean)
    ls = jnp.asarray(model.level_std)
    k = model.k

    # the exact local DP (production semantics, scan tier)
    dp = np.asarray(banded_dp.base_loglik_local_batch(
        x, path, t_len, codes, ids, lm, ls, k, CFG, t_w=T_W))

    # the fixed-path deltas the screen would use (independent shipped code:
    # suff stats + closed-form re-score)
    N = ids.shape[1]
    stats = banded_dp.segment_stats_batch(path, x, t_len, N)
    fd = np.asarray(banded_dp.base_loglik_batch(codes, ids, stats, lm, ls, k))

    live = np.any(dp != 0.0, axis=2) & (np.asarray(codes) < 4)
    clip = CFG.snp_ll_clip
    print(f"world: {dp.shape[0]} reads, live positions {live.sum()}")
    print(f"{'margin':>7} {'screened':>9} {'divergent':>10} {'%':>6} "
          f"{'max rescue':>11} {'p99 rescue':>11}")
    for margin in (10.0, 25.0, 50.0, 100.0):
        thresh = -(clip + margin)
        best_alt = np.where(fd == 0.0, -np.inf, fd).max(axis=2)
        screened = live & (best_alt <= thresh)          # position-level
        # cell-level consequence: alts at screened positions whose EXACT DP
        # value sits above -clip would change post-accumulate
        cells = screened[:, :, None] & (fd != 0.0)
        rescue = (dp - fd)[cells]
        divergent = cells & (dp > -clip + 1e-3)
        n_c = int(cells.sum())
        print(f"{margin:7.1f} {n_c:9d} {int(divergent.sum()):10d} "
              f"{100 * divergent.sum() / max(n_c, 1):6.1f} "
              f"{rescue.max() if len(rescue) else 0:11.0f} "
              f"{np.percentile(rescue, 99) if len(rescue) else 0:11.0f}")
    print("\nconclusion: the rescue tail does not decay with margin — the "
          "fixed-path delta cannot soundly predict post-clip coldness; "
          "screen-then-rescore is REFUTED (see BASELINE.md).")


if __name__ == "__main__":
    main()
