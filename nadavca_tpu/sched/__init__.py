"""Host-side scheduling: band construction, bucketing, batch assembly."""

from .bands import ChunkedBands, build_chunked_bands  # noqa: F401
