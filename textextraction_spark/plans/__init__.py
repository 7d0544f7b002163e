from textextraction_spark.plans.pipeline import run_extraction_job  # noqa: F401
