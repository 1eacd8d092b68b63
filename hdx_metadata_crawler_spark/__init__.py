"""hdx_metadata_crawler_spark — a from-scratch PySpark-native analytics/crawl engine.

Re-expresses the query and data-processing capabilities of the reference
``bennyistanto/hdx-metadata-crawler`` (a single-process pandas/stdlib notebook
pipeline; see /root/repo/SURVEY.md) as idiomatic Spark DataFrame programs:

- ``functions/``  — column-expression builders (text sanitize/slugify, URL
  canonicalization + hashing, weighted keyword scoring).
- ``operators/``  — composite DataFrame operators (dedup exact/MinHash-LSH/
  SimHash/n-gram-Jaccard, similarity search, text analysis, window patterns,
  joins, set ops) mirroring SURVEY.md §2.
- ``sources/``    — parquet readers for the driver test tables and deterministic
  synthetic generators (HDX-shaped records, crawl seed frontier, fetch resolver).
- ``plans/``      — the query registry: every SURVEY.md §2 operator as a
  (Spark callable, DuckDB oracle SQL) pair consumed by __spark_entry__.py.
- ``streaming/``  — the URL-frontier crawl engine (bloom seen-set, per-host
  politeness scheduling, retry routing, checkpoint/resume) per the north rule.

Everything is DataFrame-first: Catalyst plans the physical execution; Python
appears only in vectorized pandas/Arrow UDFs (URL canonicalization edge cases,
the politeness fetch stage), never per-row.
"""

__version__ = "0.1.0"
