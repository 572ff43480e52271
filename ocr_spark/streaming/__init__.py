"""Structured Streaming surfaces: windowed metrics over event/lineage
streams (reference W1/W4 analogs, SURVEY.md §2.7)."""

from .dedup_stream import dedup_stream  # noqa: F401
from .extract_stream import (  # noqa: F401
    extraction_stream,
    run_extraction_stream,
    run_stream_to_memory_append,
)
from .metrics import (  # noqa: F401
    lineage_rates_stream,
    run_stream_to_memory,
    windowed_event_counts_stream,
)
from .stateful import (  # noqa: F401
    cumulative_progress_stream,
    run_progress_to_memory,
)
