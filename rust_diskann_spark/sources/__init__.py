from rust_diskann_spark.sources.vectors import load_vectors, validate_vectors, with_dense_ids
from rust_diskann_spark.sources.index_store import IndexMetadata, read_metadata, write_metadata

__all__ = [
    "load_vectors",
    "validate_vectors",
    "with_dense_ids",
    "IndexMetadata",
    "read_metadata",
    "write_metadata",
]
