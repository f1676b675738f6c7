"""Joint-rescore experiment lab (VERDICT r4 next-round task 1).

The round-4 postmortem localized the joint pass's realistic-grid failures to
READ-level contamination (indel/pore-skip-distorted slices), not aggregation.
This lab iterates on that diagnosis without re-running the expensive pipeline
per variant: each (cell, seed) world — the 16x-coverage dense-SNP cells where
the F1 0.867 tail lives — is run ONCE through the production pipeline and its
state (accumulators + records + truth + per-read simulator ground truth)
cached to disk; joint-pass variants then score offline in seconds.

Variants:
  off           per-position caller (the 0.943-grid baseline rule)
  joint         shipped opt-in joint pass (r4 machinery)
  skip          + indel-tolerant slice DP (cfg.snp_joint_skip)
  filter        + per-read quality MAD filter (cfg.snp_joint_filter_mad)
  skip+filter   both
  oracle-excl   CHEATING: drop reads the simulator knows have a pore-skip
                inside the cluster's hypothesis region (upper bound for any
                read-exclusion rule)
  oracle-*      oracle-excl composed with skip

Usage:
  python scripts/joint_lab.py --build --seeds 7,8,9,10   # build caches
  python scripts/joint_lab.py --eval                      # score variants
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".cache", "joint_lab")


def _cells(which: str):
    from scripts.accuracy_sweep import Cell

    if which == "16dense":
        return [Cell(coverage=16, noise=nz, density=1 / 500)
                for nz in (0.8, 1.0, 1.2)]
    if which == "full":
        from scripts.accuracy_sweep import FULL_GRID

        return FULL_GRID
    raise SystemExit(f"unknown cell set {which}")


def _cache_path(cell, seed):
    return os.path.join(
        CACHE_DIR,
        f"c{cell.coverage}_n{cell.noise}_d{int(1/cell.density)}_s{seed}.pkl")


def sim_skip_positions(rd, k: int):
    """Genome positions whose k-mer the simulator SKIPPED (dwell 0) in this
    read — ground truth for the oracle exclusion variant."""
    n_kmer = len(rd.window_codes) - k + 1
    seen = np.zeros(n_kmer, bool)
    seen[np.asarray(rd.true_path, np.int64)] = True
    skipped_q = np.nonzero(~seen)[0]
    out = set()
    for q in skipped_q:
        if rd.strand > 0:
            g0 = rd.ref_start + int(q)
        else:
            g0 = rd.ref_end - k - int(q)
        out.update(range(g0, g0 + k))
    return out


def build_cell(cell, seed):
    """Run the production pipeline once; cache everything variants need."""
    import jax.numpy as jnp

    from nadavca_tpu import call as callmod
    from nadavca_tpu.anchor import SeedIndex
    from nadavca_tpu.config import AlignConfig
    from nadavca_tpu.pipeline import (align_batch, assemble_batch,
                                      preprocess_read)
    from scripts.accuracy_sweep import build_world

    cfg = AlignConfig()
    model, true_genome, ref_genome, reads, truth = build_world(cell, seed)
    index = SeedIndex(ref_genome)
    records = []
    for rd in reads:
        rec = preprocess_read(rd.signal.astype(np.float32), rd.basecall,
                              rd.move_index, index, ref_genome, rd.read_id)
        if rec is not None:
            records.append(rec)
    G = len(ref_genome["ref"])
    acc, cov, votes = callmod.make_accumulators(G, with_votes=True)
    records.sort(key=lambda r: len(r.signal))
    BR = 256
    for i in range(0, len(records), BR):
        group = records[i:i + BR]
        batch = assemble_batch(group, model, cfg)
        out = align_batch(batch, model, cfg, backend="scan")
        acc, cov, votes = callmod.accumulate_batch(
            acc, cov, out["base_loglik"],
            jnp.asarray(batch.window_start), jnp.asarray(batch.window_len),
            jnp.asarray(batch.strand), votes=votes, cfg=cfg)
    skip_pos = {rd.read_id: sim_skip_positions(rd, model.k) for rd in reads}
    state = dict(
        acc=np.asarray(acc), cov=np.asarray(cov), votes=np.asarray(votes),
        records=records, truth=truth, ref_codes=ref_genome["ref"].codes,
        skip_pos=skip_pos,
    )
    os.makedirs(CACHE_DIR, exist_ok=True)
    with open(_cache_path(cell, seed), "wb") as f:
        pickle.dump(state, f)
    return state


def load_cell(cell, seed):
    p = _cache_path(cell, seed)
    if os.path.exists(p):
        with open(p, "rb") as f:
            return pickle.load(f)
    return build_cell(cell, seed)


def _metas(records):
    from nadavca_tpu import joint

    return [joint.ReadMeta(r.read_id, r.anchor.contig,
                           int(r.anchor.ref_start), len(r.window_codes),
                           int(r.anchor.strand)) for r in records]


def run_variant(state, cfg, min_cov=3, oracle_excl=False):
    """Calls for one variant on a cached world."""
    from nadavca_tpu import call as callmod, joint
    from nadavca_tpu.kmer_model import default_model

    model = default_model()
    acc, cov, votes = state["acc"], state["cov"], state["votes"]
    ref_codes = state["ref_codes"]
    if not cfg.snp_joint_rescore:
        return callmod.call_snps(acc, cov, ref_codes, "ref", cfg,
                                 min_coverage=min_cov, votes=votes)
    metas = _metas(state["records"])
    records_by_id = {r.read_id: r for r in state["records"]}
    plan = joint.cluster_plan(acc, cov, votes, ref_codes, cfg,
                              min_coverage=min_cov)
    if not plan:
        return []
    if not oracle_excl:
        mats = joint.partial_deltas(plan, metas, records_by_id, model, cfg)
        return joint.decide(plan, mats, cov, ref_codes, "ref", cfg, acc=acc)
    # oracle: per cluster, drop reads whose simulated pore skips touch the
    # hypothesis region (span ± (k-1) ± a small buffer)
    k = cfg.k
    calls = []
    for c in plan:
        region = set(range(c.span[0] - (k - 1) - 2, c.span[1] + (k - 1) + 3))
        keep = [m for m in metas
                if not (state["skip_pos"].get(m.read_id, set()) & region)]
        mats = joint.partial_deltas([c], keep, records_by_id, model, cfg)
        calls.extend(joint.decide([c], mats, cov, ref_codes, "ref", cfg,
                                  acc=acc))
    return calls


def score(calls, state, min_cov=3):
    truth_set = {(p, "ACGT"[b]) for p, b in state["truth"].items()}
    cov_np = state["cov"]
    called = {(c.position, c.alt_base) for c in calls}
    callable_truth = {(p, a) for (p, a) in truth_set if cov_np[p] >= min_cov}
    tp = len(called & callable_truth)
    fp = len(called - truth_set)
    fn = len(callable_truth - called)
    return tp, fp, fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="16dense")
    ap.add_argument("--seeds", default="7")
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--variants", default=(
        "off,joint,skip,filter3,skip+filter3,oracle,oracle+skip"))
    args = ap.parse_args()
    from nadavca_tpu.config import AlignConfig
    from nadavca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    seeds = [int(s) for s in args.seeds.split(",")]
    cells = _cells(args.cells)
    worlds = []
    for cell in cells:
        for seed in seeds:
            t0 = time.time()
            cached = os.path.exists(_cache_path(cell, seed))
            st = load_cell(cell, seed)
            if not cached:
                print(f"built {os.path.basename(_cache_path(cell, seed))} "
                      f"in {time.time()-t0:.0f}s", flush=True)
            worlds.append((cell, seed, st))
    if not args.eval:
        return

    def cfg_for(v):
        base = dict(snp_joint_rescore=True)
        if "skip" in v.replace("+", ","):
            base["snp_joint_skip"] = True
        for part in v.split("+"):
            if part.startswith("filter"):
                base["snp_joint_filter_mad"] = float(part[len("filter"):])
        return dataclasses.replace(AlignConfig(), **base)

    print(f"{'variant':>16} {'TP':>4} {'FP':>4} {'FN':>4} {'microF1':>8}")
    for v in args.variants.split(","):
        agg = np.zeros(3, int)
        per = []
        for cell, seed, st in worlds:
            if v == "off":
                cfg = AlignConfig()
                calls = run_variant(st, cfg)
            else:
                calls = run_variant(st, cfg_for(v),
                                    oracle_excl=v.startswith("oracle"))
            r = score(calls, st)
            agg += np.asarray(r)
            per.append(r)
        tp, fp, fn = map(int, agg)
        prec = tp / max(1, tp + fp)
        rec = tp / max(1, tp + fn)
        f1 = 2 * prec * rec / max(1e-9, prec + rec)
        print(f"{v:>16} {tp:>4} {fp:>4} {fn:>4} {f1:>8.4f}   "
              f"{' '.join(f'{a}/{b}/{c}' for a, b, c in per)}", flush=True)


if __name__ == "__main__":
    main()
