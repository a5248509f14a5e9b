from .dedup import (
    streaming_dedup_exact,
    streaming_minhash_candidates,
    streaming_simhash_candidates,
    streaming_embedding_candidates,
)
from .histogram import streaming_histogram, windowed_histogram

__all__ = [
    "streaming_dedup_exact",
    "streaming_minhash_candidates",
    "streaming_simhash_candidates",
    "streaming_embedding_candidates",
    "streaming_histogram",
    "windowed_histogram",
]
