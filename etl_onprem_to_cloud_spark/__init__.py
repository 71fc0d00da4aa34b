"""PySpark-native analytics engine with the capability surface of
``lNixl/etl-onprem-to-cloud`` (see SURVEY.md).

The reference is an on-prem -> cloud batch ETL pipeline (extract CSV ->
PySpark clean -> CSV to S3 -> Athena/QuickSight SQL).  This package
re-expresses that whole surface Spark-first:

- ``session``     : one SparkSession factory (AQE on, UTC, s3a-ready).
- ``schemas``     : declared StructTypes (no double schema inference --
                    the reference infers on read *and* via Glue crawler,
                    reference etl/transform.py:22, README.md:145-182).
- ``sources``     : readers/writers (CSV/Parquet/JSON, latest-file
                    discovery parity with reference etl/extract.py:10-17).
- ``transforms``  : Ring A parity -- the netflix_titles clean
                    (reference etl/transform.py) with the Python UDF
                    rewritten as native, codegen-friendly expressions.
- ``operators``   : Ring B relational surface (joins, aggregates,
                    windows, set ops, top-k) the reference delegates to
                    Athena SQL (reference README.md:184-199).
- ``functions``   : scalar/text/vector function library.
- ``llm``         : Ring C large-scale training-data ops (dedup,
                    similarity search, text analysis, multimodal).
- ``streaming``   : Structured Streaming windows over the events table.
- ``queries``     : the named query registry consumed by
                    ``__spark_entry__`` (driver correctness + bench).
"""

__version__ = "0.1.0"
