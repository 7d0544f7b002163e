from textextraction_spark.sources.pages import build_pages  # noqa: F401
from textextraction_spark.sources.warc import read_warc, write_warc_dir  # noqa: F401
