"""Ship the engine to executors (the ``spark-submit --py-files`` contract).

On a real cluster the job is submitted as
``spark-submit --py-files textextraction_spark.zip job.py`` (north_star).
When the engine is used as a library (driver imports us directly — tests,
the harness entry, notebooks), executors' Python workers still need the
package on their path; ``ensure_shipped`` builds the zip once per session
and registers it via ``SparkContext.addPyFile`` — the programmatic
equivalent of ``--py-files``.

The gazetteer resource files are included; ``core/gazetteer.py`` falls back
to its generator functions when ``Path(__file__)`` points inside a zip, and
the generators produce byte-identical lists, so behavior is unchanged.
"""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

_SHIPPED_APPS: set[str] = set()


def build_zip() -> str:
    """Zip the package (py + resources) deterministically; returns path."""
    pkg_root = Path(__file__).resolve().parent.parent  # .../textextraction_spark
    zip_path = Path(tempfile.gettempdir()) / "textextraction_spark_pyfiles.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg_root.rglob("*")):
            if p.suffix in (".py", ".txt", ".md") and "__pycache__" not in p.parts:
                zf.write(p, arcname=str(p.relative_to(pkg_root.parent)))
    return str(zip_path)


def ensure_shipped(spark) -> None:
    """Idempotent per SparkSession: make the package importable on every
    executor Python worker."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED_APPS:
        return
    sc.addPyFile(build_zip())
    _SHIPPED_APPS.add(app_id)
