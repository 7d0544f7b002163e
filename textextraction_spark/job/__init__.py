from textextraction_spark.job.extract import extract_pages  # noqa: F401
