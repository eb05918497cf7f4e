"""Dataset readers and streaming input pipelines."""
