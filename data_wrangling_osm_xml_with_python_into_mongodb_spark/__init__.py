"""PySpark-native analytics/ETL engine with the capabilities of the
reference repo ``KalebCoberly/data_wrangling_osm_xml_with_python_into_mongodb``.

Not a port: the reference is single-threaded Python + MongoDB aggregation
pipelines; this package re-expresses every capability (XML ingestion,
per-record cleaning into nested documents, document sinks, profiling /
audit / inverted-index / top-k query surface) as declarative Spark
DataFrame plans designed for 100 TB scale, plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing, streaming).

Layout:
    session     -- tuned SparkSession factory
    schema      -- canonical OSM document StructTypes
    sources/    -- XML reader, parquet table loaders, sinks
    functions/  -- column-expression libraries (cleaning, text, vectors)
    operators/  -- audits, ref index, updates, profiling, dedup, similarity
    plans/      -- the registered query surface + DuckDB oracle SQL
    streaming/  -- Structured Streaming variants
"""

__version__ = "0.1.0"
