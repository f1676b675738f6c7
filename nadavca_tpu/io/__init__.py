"""Host-side IO: fast5 ingest, signal normalization, squiggle simulation."""
