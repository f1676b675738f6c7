"""Multi-host process-group validation inside pytest (SURVEY.md §4 item 4).

Spawns scripts/multihost_demo.py: 2 local jax.distributed processes (4 CPU
devices each) run the unified sharded step on their own half of a read set;
process 0 asserts the DCN-merged accumulators exactly equal a single-process
reference, and reports the per-batch collective traffic — the config-5
scaling proxy available without pod hardware.
"""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "multihost_demo.py")


def test_multihost_merge_matches_single_process(tmp_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["MULTIHOST_DEMO_REF"] = str(tmp_path / "ref.npz")
    env["MULTIHOST_DEMO_PORT"] = "9417"
    res = subprocess.run(
        [sys.executable, SCRIPT], env=env, capture_output=True, text=True,
        timeout=540,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "MULTIHOST_OK" in res.stdout, res.stdout + res.stderr
    assert "merged accumulators == single-process reference" in res.stdout


def _run_cli(argv, env, timeout=540):
    return subprocess.run([sys.executable, "-m", "nadavca_tpu.cli"] + argv,
                          env=env, capture_output=True, text=True,
                          timeout=timeout)


def test_multihost_cli_vcf_identical(tmp_path):
    """`nadavca-tpu snp --coordinator ...` with 2 processes must produce the
    byte-identical VCF of a single-process run (VERDICT r2 task 5: config 5
    reachable from the shipped tool)."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    base_env = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["PYTHONPATH"] = repo
    data = tmp_path / "data"
    sim = _run_cli(["simulate", "-o", str(data), "--reads", "24",
                    "--read-length", "400", "--genome-length", "2500",
                    "--snps", "3", "--seed", "9", "--files", "4"], base_env)
    assert sim.returncode == 0, sim.stdout + sim.stderr

    ref_vcf = tmp_path / "ref.vcf"
    env1 = dict(base_env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    r = _run_cli(["snp", str(data / "reference.fasta"), str(data),
                  "-o", str(ref_vcf), "--backend", "scan",
                  "--batch-reads", "8", "--devices", "all"], env1)
    assert r.returncode == 0, r.stdout + r.stderr

    # two processes, one CPU device each, DCN-style merge via the CLI
    out_vcf = tmp_path / "mh.vcf"
    env2 = dict(base_env)
    env2["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "nadavca_tpu.cli", "snp",
             str(data / "reference.fasta"), str(data), "-o", str(out_vcf),
             "--backend", "scan", "--batch-reads", "8",
             "--coordinator", "127.0.0.1:9431",
             "--num-processes", "2", "--process-id", str(i)],
            env=env2, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    ref_body = [l for l in ref_vcf.read_text().splitlines()
                if not l.startswith("##")]
    mh_body = [l for l in out_vcf.read_text().splitlines()
               if not l.startswith("##")]
    assert mh_body == ref_body, (mh_body, ref_body)
    # at least one real call so the equality is not vacuous
    assert sum(1 for l in mh_body if not l.startswith("#")) >= 1
