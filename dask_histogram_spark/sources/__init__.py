from .io import (
    load_histogram,
    read_jsonl_corpus,
    read_shard_manifest,
    read_table,
    save_histogram,
    write_bucketed,
    write_training_shards,
)

__all__ = ["read_table", "read_jsonl_corpus", "save_histogram",
           "load_histogram",
           "write_bucketed", "write_training_shards",
           "read_shard_manifest"]
