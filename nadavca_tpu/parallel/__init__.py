"""Mesh setup, shard_map pipelines, sharded locus accumulators, collectives."""
