from .histogram import streaming_histogram, windowed_histogram

__all__ = ["streaming_histogram", "windowed_histogram"]
