from textextraction_spark.sources.pages import build_pages  # noqa: F401
from textextraction_spark.sources.warc import (  # noqa: F401
    read_warc,
    read_wet,
    write_warc_dir,
    write_wet_dir,
)
