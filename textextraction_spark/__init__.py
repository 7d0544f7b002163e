"""textextraction_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of the capabilities of the reference worker
service ``vijay-chaudhari/TextExtraction`` (a .NET OCR + field-extraction
pipeline, see /root/reference) as stateless, vectorized Spark transforms:

- ``core/``      pure-Python semantics kernel (no Spark imports): HTML DOM
                 parse, boilerplate strip, PDF text-block parse, field/span
                 extractors, bounded date grammar, gazetteer NER.  This is
                 the single source of truth for extraction semantics, shared
                 by the Spark UDFs, the test oracle, and the golden fixtures.
- ``job/``       the Spark job: schemas, the ``mapInPandas`` extraction
                 kernel, and the end-to-end pipeline (scan -> prune ->
                 checkpoint anti-join -> salted repartition -> extract ->
                 sink + lineage metrics).
- ``io/``        catalog/checkpoint abstraction (Iceberg MERGE when jars are
                 present; local parquet state table + anti-join otherwise).
- ``operators/`` web-scale training-data operators: dedup (exact, MinHash
                 LSH, SimHash, n-gram Jaccard, embedding near-dup),
                 similarity search (brute-force + LSH-bucketed ANN), text
                 analysis (lang-id, quality, tokens, fingerprints),
                 multimodal binary-column plumbing.
- ``sources/``   deterministic Common-Crawl-style ``pages`` table builder
                 (the BASELINE.json input_hint shape) derived from the
                 driver's ``documents`` parquet.
- ``streaming/`` Structured Streaming variant of the extraction job
                 (micro-batch trigger, foreachBatch exactly-once commit).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
