from textextraction_spark.sources.pages import build_pages  # noqa: F401
