from .io import read_table, save_histogram, load_histogram

__all__ = ["read_table", "save_histogram", "load_histogram"]
