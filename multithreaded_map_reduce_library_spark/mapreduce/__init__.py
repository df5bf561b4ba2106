from multithreaded_map_reduce_library_spark.mapreduce.api import mr_run, mr_run_pairs  # noqa: F401
