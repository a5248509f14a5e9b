from .dedup import streaming_dedup_exact
from .histogram import streaming_histogram, windowed_histogram

__all__ = ["streaming_dedup_exact", "streaming_histogram", "windowed_histogram"]
