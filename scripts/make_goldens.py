"""Generate committed golden outputs for regression testing (SURVEY.md §4.2).

The real nadavca is unobtainable in this sandbox (SURVEY.md provenance note),
so the golden files are OUR pipeline's outputs on a frozen simulated dataset:
any future change that silently alters calls or alignments fails the golden
test and must either be a bug or consciously regenerate these files.
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from nadavca_tpu import cli

GOLD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "goldens")


def main():
    os.makedirs(GOLD, exist_ok=True)
    data = os.path.join(GOLD, "data")
    if os.path.exists(data):
        shutil.rmtree(data)
    cli.main(["simulate", "-o", data, "--reads", "16", "--files", "2",
              "--read-length", "300", "--genome-length", "1500", "--snps", "2",
              "--seed", "20260817"])
    cli.main(["snp", os.path.join(data, "reference.fasta"), data,
              "-o", os.path.join(GOLD, "calls.vcf"), "--backend", "scan",
              "--batch-reads", "16"])
    aln = os.path.join(GOLD, "aln")
    if os.path.exists(aln):
        shutil.rmtree(aln)
    cli.main(["align", os.path.join(data, "reference.fasta"), data,
              "-o", aln, "--backend", "scan", "--batch-reads", "16"])
    print("goldens written to", GOLD)


if __name__ == "__main__":
    main()
