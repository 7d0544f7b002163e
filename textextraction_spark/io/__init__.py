from textextraction_spark.io.checkpoint import CheckpointCatalog  # noqa: F401
