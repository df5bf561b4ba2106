from multithreaded_map_reduce_library_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    Query,
    all_queries,
    oracle_sql,
    queries,
    register,
)
