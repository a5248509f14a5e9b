from .io import load_histogram, read_table, save_histogram, write_bucketed

__all__ = ["read_table", "save_histogram", "load_histogram", "write_bucketed"]
