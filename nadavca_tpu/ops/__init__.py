"""Compute ops: banded DP (numpy spec, lax.scan, Pallas kernel), SNP scoring."""
