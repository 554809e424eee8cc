"""PySpark-native analytics engine with the capabilities of
chhokara/drive-bc-datapipeline, rebuilt Spark-first.

Layout:
- ``session``    — tuned SparkSession factory
- ``tables``     — testdata catalog loader
- ``sources``    — readers/writers (parquet/json/csv)
- ``functions``  — reusable Column expressions (time/text/geo/hash/vector)
- ``operators``  — the engine's operators (cleaning, aggregation, joins,
                   dedup, similarity, text, geo, ml, multimodal)
- ``plans``      — named end-to-end queries + DuckDB oracle SQL registry
- ``streaming``  — Structured Streaming pipelines
"""

__version__ = "0.1.0"
