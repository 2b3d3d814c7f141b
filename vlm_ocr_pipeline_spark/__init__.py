"""vlm_ocr_pipeline_spark — a PySpark-native web-scale main-content
extraction engine.

A from-scratch reimplementation of the *semantics* of
NoUnique/vlm-ocr-pipeline (see /root/reference) as a columnar,
partition-parallel Spark pipeline over Common-Crawl-style page tables
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Layout:

- ``functions/``  pure pandas/numpy kernels (no Spark import): geometry,
  XY-cut ordering, overlap dedup, markdown/plaintext rendering,
  correction, HTML boilerplate extraction, minimal PDF span parsing.
  These define the golden fixtures and are unit-tested without a JVM.
- ``operators/``  Spark stage wrappers (mapInPandas w/ per-partition init
  + lineage), plus training-data ops: dedup (exact/minhash/simhash/
  jaccard), similarity search, text analysis, multimodal plumbing.
- ``sources/``    page-table readers/writers, deterministic synthetic
  page generator, checkpoint tables + anti-join resume.
- ``plans/``      session builder, pipeline DAG assembly, salting,
  lineage sink.
- ``streaming/``  Structured Streaming ingest tier (optional).
"""

__version__ = "0.1.0"

# public API surface (lazy to keep `import vlm_ocr_pipeline_spark`
# JVM-free for kernel-only users)
def __getattr__(name):
    if name in ("extract", "CheckpointedRun", "salted_repartition", "split_lineage"):
        from .plans import pipeline

        return getattr(pipeline, name)
    if name == "get_spark":
        from .plans.session import get_spark

        return get_spark
    if name == "synth_pages":
        from .sources.datagen import synth_pages

        return synth_pages
    if name == "register_sql_functions":
        from .plans.sqlfuncs import register_sql_functions

        return register_sql_functions
    raise AttributeError(name)
