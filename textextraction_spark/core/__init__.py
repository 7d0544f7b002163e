"""Pure-Python extraction kernel (no Spark imports allowed here).

This package defines the *semantics* of extraction once; the Spark layer
only vectorizes it.  The correctness contract (BASELINE.json north_rule) is
byte-identical ``extracted_text`` per url at every parallelism level, which
is guaranteed by keeping extraction a pure function of the document bytes.
"""

from textextraction_spark.core.model import Doc, Line, Page, Span, Word  # noqa: F401
from textextraction_spark.core.extract import extract_document  # noqa: F401
