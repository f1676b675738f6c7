"""Real-TPU smoke gate: compile + run EVERY Pallas kernel at production shapes.

Round-2 postmortem (VERDICT.md weakness #1/#2): an optimization to the
path-counts kernel passed the whole interpret-mode test suite but failed to
*compile* under Mosaic on real hardware, killing bench.py and the production
``snp/align --backend pallas`` path. Interpret-green / Mosaic-red is the
failure mode this gate makes structurally impossible: run it (on the real
chip, no test env vars) before ending any working session.

Three tiers, all through the production ``pipeline._device_step`` program so
every ``pallas_call`` site is exercised exactly as the CLI runs it
(fill, advance-bits backtrack, path-counts, shear-gather, rescore-fill):

1. **Compile coverage** — every production shape config on the real TPU:
   read_tile 32/128, band 128/256, genome subst tables on/off, use_skip
   on/off, batch 128/256. Catches Mosaic rejections and shape bugs.
2. **Interpret parity (small shape)** — real-TPU outputs vs the same program
   in Pallas interpret mode on CPU: path bit-equal, score/base_ll allclose.
   Covers the tables path too (interpret at small shape is cheap).
3. **Scan parity (production shape)** — real-TPU pallas vs the lax.scan
   backend on CPU: Viterbi paths bit-equal, scores allclose. The scan
   backend is itself parity-locked to the f64 spec by the test suite.

Exit code 0 = all green. Usage:
    python scripts/tpu_smoke.py            # full gate (~2-4 min incl. compiles)
    python scripts/tpu_smoke.py --fast     # tier 1 only
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_records(rng, genome, model, n_reads, read_len, cfg):
    """Simulated reads -> preprocessed ReadRecords via the production prep."""
    from nadavca_tpu.io.simulator import simulate_read
    from nadavca_tpu.pipeline import ReadRecord

    recs = []
    for i in range(n_reads):
        p = simulate_read(genome, "ref", model, rng, read_len=read_len,
                          strand=1, mean_dwell=8.0, read_id=f"smoke{i:04d}")
        from nadavca_tpu.anchor import Anchor

        a = Anchor(contig="ref", strand=1, ref_start=p.ref_start,
                   ref_end=p.ref_start + len(p.window_codes),
                   base_to_window=np.arange(len(p.window_codes)), score=1)
        mu, sigma = model.expected_signal(p.window_codes)
        recs.append(ReadRecord(
            read_id=p.read_id, signal=p.signal.astype(np.float32), anchor=a,
            anchor_path=p.true_path.astype(np.float64),
            window_codes=p.window_codes, mu=mu, sigma=sigma,
        ))
    return recs


def run_config(name, cfg, records, model, subst, backend, interpret,
               device=None):
    """Assemble + stage + run ONE _device_step; returns host numpy outputs."""
    import jax

    from nadavca_tpu.pipeline import (_device_step, assemble_batch,
                                      stage_batch)

    batch = assemble_batch(records, model, cfg)
    ctx = jax.default_device(device) if device is not None else _nullctx()
    with ctx:
        staged = stage_batch(batch, model, cfg, backend, subst=subst)
        t0 = time.time()
        score, path, base_ll = _device_step(
            staged["x"], staged["t_len"], staged["mu"], staged["sigma"],
            staged["n_ref"], staged["lo"], staged["delta"], staged["mu_b"],
            staged["sg_b"], staged["codes"], staged["ids"], staged["lm"],
            staged["ls"], staged["woff"], staged["ttab"], staged["tva"],
            cfg=cfg, backend=staged["backend"], k=staged["k"],
            interpret=interpret,
        )
        out = (np.asarray(score), np.asarray(path), np.asarray(base_ll))
    dt = time.time() - t0
    print(f"  [{name}] backend={backend} interpret={interpret} "
          f"shapes={batch.shapes} {dt:.1f}s", flush=True)
    return out, batch


class _nullctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def check_sane(name, cfg, out, batch, use_skip):
    score, path, base_ll = out
    n = batch.n_reads
    assert np.all(np.isfinite(score[:n])), f"{name}: non-finite scores"
    assert np.all(np.isfinite(base_ll)), f"{name}: non-finite base_ll"
    # paths monotone nondecreasing with step <= 1 (+skip: <= 2) on live samples
    max_step = 2 if use_skip else 1
    for r in range(min(n, 8)):
        t = int(batch.t_len[r])
        d = np.diff(path[r, :t])
        assert d.min() >= 0 and d.max() <= max_step, (
            f"{name}: read {r} path steps in [{d.min()}, {d.max()}]")
    print(f"  [{name}] sane: scores finite, paths monotone", flush=True)


def compare(name, got, want, batch, path_exact=True, tol=2e-3):
    (gs, gp, gl), (ws, wp, wl) = got, want
    n = batch.n_reads
    live = np.arange(batch.x.shape[1])[None, :] < batch.t_len[:n, None]
    if path_exact:
        bad = (gp[:n] != wp[:n]) & live
        assert not bad.any(), (
            f"{name}: {bad.sum()} path mismatches "
            f"(first at {np.argwhere(bad)[0]})")
    np.testing.assert_allclose(gs[:n], ws[:n], rtol=tol, atol=tol,
                               err_msg=f"{name}: scores")
    np.testing.assert_allclose(gl[:n], wl[:n], rtol=tol, atol=5e-3,
                               err_msg=f"{name}: base_ll")
    print(f"  [{name}] parity OK (path bit-equal, scores/ll allclose)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="tier 1 (compile coverage) only")
    args = ap.parse_args()

    import jax

    from nadavca_tpu.config import AlignConfig
    from nadavca_tpu.io.simulator import random_genome
    from nadavca_tpu.kmer_model import default_model
    from nadavca_tpu.ops.subst_tables import build_subst_tables
    from nadavca_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print("WARNING: no TPU present — gate degrades to CPU-only "
              "(compile coverage NOT validated against Mosaic)", flush=True)
    cpu = jax.local_devices(backend="cpu")[0]

    rng = np.random.default_rng(11)
    model = default_model()
    genome = random_genome(rng, length=4000)
    subst = build_subst_tables(genome, model)

    failures = []

    # ---- tier 1: compile coverage at production shapes -------------------
    print("tier 1: Mosaic compile coverage (production shapes)", flush=True)
    base = AlignConfig()
    tier1 = [
        # (name, cfg, n_reads, read_len, tables?)
        ("bench.t128", dataclasses.replace(base, read_tile=128),
         128, 700, True),
        ("cli.t32", base, 128, 700, True),
        ("cli.t32.notab", base, 128, 700, False),
        ("cli.wide256",
         dataclasses.replace(base, band_width=256), 128, 700, True),
        ("cli.skip",
         dataclasses.replace(base, use_skip=True, log_p_skip=-4.6),
         128, 700, True),
        ("cli.b256", base, 256, 700, True),
    ]
    recs_cache = {}
    for name, cfg, n_reads, read_len, tables in tier1:
        key = (n_reads, read_len)
        if key not in recs_cache:
            recs_cache[key] = build_records(
                rng, genome, model, n_reads, read_len, cfg)
        try:
            out, batch = run_config(name, cfg, recs_cache[key], model,
                                    subst if tables else None, "pallas",
                                    interpret=False)
            check_sane(name, cfg, out, batch, cfg.use_skip)
        except Exception as e:
            failures.append((name, e))
            print(f"  [{name}] FAILED: {e}", flush=True)

    if not args.fast:
        # ---- tier 2: interpret parity at a small shape -------------------
        print("tier 2: real-TPU vs interpret-on-CPU parity (small shape)",
              flush=True)
        small = dataclasses.replace(base, read_tile=8)
        recs_small = build_records(rng, genome, model, 16, 150, small)
        skip_cfg = dataclasses.replace(small, use_skip=True, log_p_skip=-4.6)
        for name, cfg, tables, ref in [
            ("small", small, False, "interpret"),
            ("small.tab", small, True, "interpret"),
            # the skip-variant interpret program hits a pathological XLA:CPU
            # compile (>5 min); the scan backend is an equally binding
            # reference (skip parity scan ≡ f64 spec is in the test suite)
            ("small.skip", skip_cfg, False, "scan"),
        ]:
            try:
                got, batch = run_config(
                    name, cfg, recs_small, model,
                    subst if tables else None, "pallas", interpret=False)
                if ref == "interpret":
                    want, _ = run_config(
                        name + ".ref", cfg, recs_small, model,
                        subst if tables else None, "pallas", interpret=True,
                        device=cpu)
                else:
                    want, _ = run_config(
                        name + ".ref", cfg, recs_small, model,
                        None, "scan", interpret=False, device=cpu)
                compare(name, got, want, batch)
            except Exception as e:
                failures.append((name, e))
                print(f"  [{name}] FAILED: {e}", flush=True)

        # ---- tier 3: scan parity at production shape ---------------------
        # Both backends on the SAME device: paths must be bit-equal (verified
        # 0/715k mismatches on the real v5e). A CPU scan reference differs by
        # a handful of ±1-position argmax flips from cross-device `log` ulp
        # noise — that cross-device check lives in tier 2 at tolerance.
        print("tier 3: pallas vs scan on the same device (production shape)",
              flush=True)
        try:
            recs = recs_cache[(128, 700)]
            got, batch = run_config("scanpar", base, recs, model, None,
                                    "pallas", interpret=False)
            want, _ = run_config("scanpar.ref", base, recs, model, None,
                                 "scan", interpret=False)
            compare("scanpar", got, want, batch)
        except Exception as e:
            failures.append(("scanpar", e))
            print(f"  [scanpar] FAILED: {e}", flush=True)

        # ---- tier 3b: DMA-tables rescore at production shape -------------
        # tables-on vs tables-off pallas on the same chip: identical paths;
        # base_ll allclose on positions the tables path scores (it masks
        # window-edge positions to 0 — compare where it is nonzero). This is
        # the only affordable production-shape numeric check of the
        # _rescore_tab_kernel DMA path (interpret at this shape is minutes).
        print("tier 3b: DMA-tables vs computed-tables rescore (production "
              "shape)", flush=True)
        try:
            recs = recs_cache[(128, 700)]
            got, batch = run_config("tabpar", base, recs, model, subst,
                                    "pallas", interpret=False)
            want, _ = run_config("tabpar.ref", base, recs, model, None,
                                 "pallas", interpret=False)
            n = batch.n_reads
            assert np.array_equal(got[1][:n], want[1][:n]), "paths differ"
            scored = got[2][:n] != 0.0
            np.testing.assert_allclose(
                np.where(scored, got[2][:n], 0.0),
                np.where(scored, want[2][:n], 0.0),
                rtol=2e-3, atol=5e-3, err_msg="tabpar: base_ll")
            frac = scored.any(axis=2).mean()
            assert frac > 0.5, f"tables path scored only {frac:.2%} of positions"
            print(f"  [tabpar] parity OK ({frac:.1%} positions scored)",
                  flush=True)
        except Exception as e:
            failures.append(("tabpar", e))
            print(f"  [tabpar] FAILED: {e}", flush=True)

    if failures:
        print(f"SMOKE GATE: {len(failures)} FAILURE(S): "
              f"{[n for n, _ in failures]}", flush=True)
        return 1
    print("SMOKE GATE: all green", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
