from rust_diskann_spark.functions.distance import (
    distance_expr,
    numpy_distance,
    l2_normalize_expr,
)

__all__ = ["distance_expr", "numpy_distance", "l2_normalize_expr"]
