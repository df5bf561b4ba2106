from multithreaded_map_reduce_library_spark.sources.catalog import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_text_lines,
    register_views,
)
from multithreaded_map_reduce_library_spark.sources.sinks import (  # noqa: F401
    write_partitioned_text,
)
