from textextraction_spark.streaming.stream_job import run_streaming_extraction  # noqa: F401
