"""Command-line interface: ``align`` and ``snp`` subcommands.

Mirrors the reference CLI shape (SURVEY.md L4: ``nadavca align <ref.fasta>
<fast5 dir> ...``, ``nadavca snp ...``, ``--configuration`` YAML override —
reconstructed; mount empty), plus a ``simulate`` subcommand that fabricates
fast5 test data since no real nanopore data ships with this sandbox.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List

import numpy as np

from . import call as callmod
from .config import AlignConfig, DEFAULT_CONFIG
from .genome import Genome
from .io import fast5 as fast5mod
from .kmer_model import KmerModel, default_model
from .pipeline import (align_batch, assemble_batch, path_to_segments,
                       stage_batch)
from .utils.metrics import Metrics


def _load_cfg(args) -> AlignConfig:
    if getattr(args, "configuration", None):
        return AlignConfig.from_yaml(args.configuration)
    return DEFAULT_CONFIG


def _load_model(args, cfg) -> KmerModel:
    if getattr(args, "model", None):
        return KmerModel.load_tsv(args.model)
    return default_model(cfg.k)


def _iter_batches(records, batch_reads):
    # bucket by signal length so padding waste stays low
    records = sorted(records, key=lambda r: len(r.signal))
    for i in range(0, len(records), batch_reads):
        yield records[i : i + batch_reads]


def _prefetched(groups, prepare, depth=2):
    """Assemble upcoming batches in a background thread (SURVEY §2.2 PP row:
    the host pipeline overlaps ingest/assembly with device compute)."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for g in groups:
                q.put(prepare(g))
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def _cfg_for_group(cfg, group):
    """Adaptive band (SURVEY config 3): long-read buckets get the wide band.

    Longer reads accumulate more anchor drift, so their bucket compiles with
    band_width_long; short buckets keep the narrow band's throughput.
    """
    import dataclasses as _dc

    t_max = max(len(r.signal) for r in group)
    if t_max > cfg.adaptive_band_threshold and cfg.band_width < cfg.band_width_long:
        return _dc.replace(cfg, band_width=cfg.band_width_long)
    return cfg


def _iter_raw_reads(directory):
    yield from fast5mod.iter_fast5_dir(directory)
    from .io import pod5 as pod5mod

    if pod5mod.HAVE_POD5:
        yield from pod5mod.iter_pod5_dir(directory)


def _preprocess_all(args, cfg, genome, metrics, model=None,
                    skip_ids=None):
    """Ingest + anchor all reads; per-read work fans out over a thread pool
    (the reference's only parallelism was a multiprocessing pool over reads —
    SURVEY.md "Per-read parallelism" row; here host threads feed the device).
    Prep runs on the native C++ engine when available (--prep)."""
    from concurrent.futures import ThreadPoolExecutor

    from .pipeline import make_preprocessor

    skip_ids = skip_ids or set()
    workers = max(1, getattr(args, "workers", 1))
    work = make_preprocessor(genome, cfg, model=model,
                             mode=getattr(args, "prep", "auto"))

    raws = [r for r in _iter_raw_reads(args.fast5_dir)
            if r.read_id not in skip_ids]
    metrics.count("reads_resumed_skip", 0)
    if skip_ids:
        metrics.count("reads_resumed_skip",
                      sum(1 for _ in skip_ids))
    if workers > 1:
        with ThreadPoolExecutor(workers) as pool:
            results = list(pool.map(work, raws))
    else:
        results = [work(r) for r in raws]
    records = [r for r in results if r is not None]
    metrics.count("reads_ingested", len(records))
    metrics.count("reads_skipped", len(results) - len(records))
    return records


def _maybe_subst_tables(args, genome, model):
    """Genome-level rescore tables when the pallas backend will run."""
    import jax

    backend = args.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend != "pallas":
        return None
    from .ops.subst_tables import build_subst_tables

    return build_subst_tables(genome, model)


def cmd_align(args) -> int:
    cfg = _load_cfg(args)
    model = _load_model(args, cfg)
    genome = Genome.from_fasta(args.reference)
    metrics = Metrics()
    os.makedirs(args.output, exist_ok=True)
    records = _preprocess_all(args, cfg, genome, metrics, model=model)
    subst = _maybe_subst_tables(args, genome, model)
    t0 = time.time()
    n_done = 0
    def _prep(group):
        gcfg = _cfg_for_group(cfg, group)
        batch = assemble_batch(group, model, gcfg)
        staged = stage_batch(batch, model, gcfg, args.backend, subst=subst)
        return group, gcfg, batch, staged

    for group, gcfg, batch, staged in _prefetched(
            _iter_batches(records, args.batch_reads), _prep):
        waste = 1.0 - float(batch.t_len.sum()) / (batch.x.shape[0] * batch.x.shape[1])
        metrics.gauge("padding_waste", waste)
        out = align_batch(batch, model, gcfg, backend=args.backend, subst=subst,
                          staged=staged)
        paths = np.asarray(out["path"])
        for r in range(batch.n_reads):
            t = int(batch.t_len[r])
            n = int(batch.n_ref[r])
            seg_start, seg_end = path_to_segments(paths[r], t, n)
            rec = group[r]
            out_path = os.path.join(args.output, f"{rec.read_id}.txt")
            callmod.write_alignment(
                out_path, rec.read_id, rec.anchor.contig, rec.anchor.strand,
                rec.anchor.ref_start, rec.anchor.ref_end, seg_start, seg_end,
            )
            n_done += 1
        metrics.count("reads_aligned", batch.n_reads)
    dt = time.time() - t0
    metrics.gauge("reads_per_s", n_done / dt if dt > 0 else 0.0)
    metrics.report(sys.stderr)
    print(f"aligned {n_done} reads -> {args.output}", file=sys.stderr)
    return 0


def cmd_snp(args) -> int:
    import jax.numpy as jnp

    from .utils.checkpoint import load_checkpoint, save_checkpoint
    from .utils.profiling import trace

    cfg = _load_cfg(args)
    model = _load_model(args, cfg)
    genome = Genome.from_fasta(args.reference)
    metrics = Metrics()

    # resume from checkpoint if present
    ckpt_accs, done_ids = ({}, set())
    if args.checkpoint:
        ckpt_accs, done_ids = load_checkpoint(args.checkpoint)
        if done_ids:
            print(f"resuming: {len(done_ids)} reads already merged",
                  file=sys.stderr)
    records = _preprocess_all(args, cfg, genome, metrics, model=model,
                              skip_ids=done_ids)

    # per-contig accumulators (host keeps a dict; device does each batch)
    contigs = {c.name: len(c) for c in genome}
    accs = {}
    for n, l in contigs.items():
        if n in ckpt_accs:
            a, c, v = (jnp.asarray(ckpt_accs[n][0]), jnp.asarray(ckpt_accs[n][1]),
                       jnp.asarray(ckpt_accs[n][2]) if len(ckpt_accs[n]) > 2
                       else jnp.zeros((l, 4), jnp.int32))
            accs[n] = (a, c, v)
        else:
            accs[n] = callmod.make_accumulators(l, with_votes=True)

    def save_ckpt():
        if args.checkpoint:
            import numpy as _np
            save_checkpoint(
                args.checkpoint,
                {n: (_np.asarray(a), _np.asarray(c), _np.asarray(v))
                 for n, (a, c, v) in accs.items()},
                done_ids,
            )

    subst = _maybe_subst_tables(args, genome, model)
    t0 = time.time()
    n_done = 0
    n_batches = 0
    def _prep(group):
        gcfg = _cfg_for_group(cfg, group)
        batch = assemble_batch(group, model, gcfg)
        staged = stage_batch(batch, model, gcfg, args.backend, subst=subst)
        return group, gcfg, batch, staged

    seen_shapes = set()
    steady_reads, steady_secs = 0, 0.0
    for group, gcfg, batch, staged in _prefetched(
            _iter_batches(records, args.batch_reads), _prep):
        waste = 1.0 - float(batch.t_len.sum()) / (batch.x.shape[0] * batch.x.shape[1])
        metrics.gauge("padding_waste", waste)
        shape_key = (batch.shapes, gcfg.band_width)
        tb = time.time()
        out = align_batch(batch, model, gcfg, backend=args.backend, subst=subst,
                          staged=staged)
        np.asarray(out["score"])  # host fetch = true sync (block_until_ready
        #                           returns early through the axon tunnel)
        if shape_key in seen_shapes:  # compiled executable reused
            steady_reads += batch.n_reads
            steady_secs += time.time() - tb
        seen_shapes.add(shape_key)
        # group reads by contig for accumulation
        by_contig = {}
        for r in range(batch.n_reads):
            by_contig.setdefault(group[r].anchor.contig, []).append(r)
        for cname, rows in by_contig.items():
            rows_arr = np.asarray(rows, np.int32)
            acc, cov, votes = accs[cname]
            acc, cov, votes = callmod.accumulate_batch(
                acc, cov,
                out["base_loglik"][rows_arr],
                jnp.asarray(batch.window_start[rows_arr]),
                jnp.asarray(batch.window_len[rows_arr]),
                jnp.asarray(batch.strand[rows_arr]),
                votes=votes, cfg=cfg,
            )
            accs[cname] = (acc, cov, votes)
        n_done += batch.n_reads
        n_batches += 1
        done_ids.update(batch.read_ids[: batch.n_reads])
        metrics.count("reads_called", batch.n_reads)
        if args.checkpoint and n_batches % args.checkpoint_every == 0:
            save_ckpt()
    save_ckpt()
    all_calls: List[callmod.SnpCall] = []
    for cname, (acc, cov, votes) in accs.items():
        all_calls.extend(
            callmod.call_snps(
                np.asarray(acc), np.asarray(cov), genome[cname].codes, cname,
                cfg, min_coverage=args.min_coverage, votes=np.asarray(votes),
            )
        )
    callmod.write_vcf(args.output, all_calls)
    dt = time.time() - t0
    metrics.gauge("reads_per_s", n_done / dt if dt > 0 else 0.0)
    if steady_secs > 0:
        # throughput once each bucket shape is compiled — the number that
        # scales with more reads (first-batch wall is remote-compile noise)
        metrics.gauge("reads_per_s_steady", steady_reads / steady_secs)
    metrics.report(sys.stderr)
    print(f"{len(all_calls)} SNP calls from {n_done} reads -> {args.output}",
          file=sys.stderr)
    return 0


def cmd_simulate(args) -> int:
    from .io.simulator import random_genome, simulate_read

    rng = np.random.default_rng(args.seed)
    cfg = _load_cfg(args)
    model = _load_model(args, cfg)
    if args.reference and os.path.exists(args.reference):
        genome = Genome.from_fasta(args.reference)
    else:
        genome = random_genome(rng, length=args.genome_length)
    os.makedirs(args.output, exist_ok=True)
    ref_path = os.path.join(args.output, "reference.fasta")
    genome.to_fasta(ref_path)

    # optionally plant SNPs into the written reference (reads keep the truth)
    truth = []
    if args.snps > 0:
        contig = genome.contigs[0]
        codes = contig.codes.copy()
        positions = rng.choice(len(codes) - 20, size=args.snps, replace=False) + 10
        for p in sorted(positions):
            orig = int(codes[p])
            codes[p] = (orig + int(rng.integers(1, 4))) % 4
            truth.append((contig.name, int(p), orig, int(codes[p])))
        mutated = Genome.from_dict({contig.name: ""})
        mutated.contigs[0].codes = codes
        mutated._by_name = {contig.name: mutated.contigs[0]}
        mutated.to_fasta(ref_path)
        with open(os.path.join(args.output, "truth_snps.tsv"), "w") as f:
            f.write("contig\tpos0\tsample_base\tref_base\n")
            for cname, p, orig, new in truth:
                f.write(f"{cname}\t{p}\t{'ACGT'[orig]}\t{'ACGT'[new]}\n")

    contig = genome.contigs[0].name
    reads = [
        simulate_read(genome, contig, model, rng, read_len=args.read_length,
                      read_id=f"sim{i:05d}")
        for i in range(args.reads)
    ]
    per_file = max(1, args.reads // max(1, args.files))
    for fi in range(0, len(reads), per_file):
        fast5mod.write_fast5(
            os.path.join(args.output, f"reads_{fi // per_file:03d}.fast5"),
            reads[fi : fi + per_file],
        )
    print(f"simulated {len(reads)} reads -> {args.output}", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nadavca-tpu",
        description="TPU-native nanopore raw-signal alignment and SNP calling",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("reference", help="reference FASTA")
        sp.add_argument("fast5_dir", help="directory of .fast5 files")
        sp.add_argument("--configuration", help="YAML config override")
        sp.add_argument("--model", help="k-mer model tsv (default: builtin)")
        sp.add_argument("--batch-reads", type=int, default=256)
        sp.add_argument("--backend", default="auto",
                        choices=["auto", "pallas", "scan"])
        sp.add_argument("--workers", type=int, default=2,
                        help="host ingest/preprocess threads")
        sp.add_argument("--prep", default="auto",
                        choices=["auto", "native", "python"],
                        help="per-read prep engine (native = C++ csrc/prep)")
        sp.add_argument("--profile", help="write a jax.profiler trace here")

    sa = sub.add_parser("align", help="signal→reference alignments per read")
    common(sa)
    sa.add_argument("-o", "--output", required=True, help="output directory")
    sa.set_defaults(fn=cmd_align)

    ss = sub.add_parser("snp", help="signal-level SNP calls")
    common(ss)
    ss.add_argument("-o", "--output", required=True, help="output VCF path")
    ss.add_argument("--min-coverage", type=int, default=2)
    ss.add_argument("--checkpoint", help="accumulator checkpoint path (resume)")
    ss.add_argument("--checkpoint-every", type=int, default=8,
                    help="save the checkpoint every N batches")
    ss.set_defaults(fn=cmd_snp)

    sm = sub.add_parser("simulate", help="generate synthetic fast5 test data")
    sm.add_argument("--reference", help="FASTA to simulate from (default: random)")
    sm.add_argument("-o", "--output", required=True)
    sm.add_argument("--reads", type=int, default=32)
    sm.add_argument("--files", type=int, default=4)
    sm.add_argument("--read-length", type=int, default=600)
    sm.add_argument("--genome-length", type=int, default=5000)
    sm.add_argument("--snps", type=int, default=0)
    sm.add_argument("--seed", type=int, default=0)
    sm.add_argument("--configuration")
    sm.add_argument("--model")
    sm.set_defaults(fn=cmd_simulate)
    return p


def main(argv=None) -> int:
    from .utils.cache import enable_compile_cache
    from .utils.profiling import trace

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    with trace(getattr(args, "profile", None)):
        return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
