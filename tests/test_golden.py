"""Golden-run regression tests (SURVEY.md §4.2).

The goldens are this pipeline's own outputs on a frozen simulated dataset
(scripts/make_goldens.py regenerates them; the real nadavca is unobtainable —
SURVEY.md provenance note). Any silent change to calls or alignments fails
here.
"""

import os

import numpy as np
import pytest

from nadavca_tpu import cli
from nadavca_tpu.io import fast5

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

pytestmark = pytest.mark.skipif(
    not (fast5.HAVE_H5PY and os.path.exists(os.path.join(GOLD, "calls.vcf"))),
    reason="goldens not generated",
)


def _vcf_body(path):
    return [l for l in open(path) if not l.startswith("#")]


def test_snp_calls_match_golden(tmp_path):
    out = str(tmp_path / "calls.vcf")
    rc = cli.main(["snp", os.path.join(GOLD, "data", "reference.fasta"),
                   os.path.join(GOLD, "data"), "-o", out,
                   "--backend", "scan", "--batch-reads", "16"])
    assert rc == 0
    assert _vcf_body(out) == _vcf_body(os.path.join(GOLD, "calls.vcf"))


def test_alignments_match_golden(tmp_path):
    out = str(tmp_path / "aln")
    rc = cli.main(["align", os.path.join(GOLD, "data", "reference.fasta"),
                   os.path.join(GOLD, "data"), "-o", out,
                   "--backend", "scan", "--batch-reads", "16"])
    assert rc == 0
    gold_aln = os.path.join(GOLD, "aln")
    names = sorted(os.listdir(gold_aln))
    assert sorted(os.listdir(out)) == names
    for n in names:
        assert open(os.path.join(out, n)).read() == \
            open(os.path.join(gold_aln, n)).read(), f"alignment drift: {n}"
