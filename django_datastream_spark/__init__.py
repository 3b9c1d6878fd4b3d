"""django_datastream_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of wlanslovenija/django-datastream.

The reference (see SURVEY.md §0: `«dds»` = django-datastream HTTP layer,
`«ds»` = datastream core library) is a fixed-function time-series store:
streams of timestamped datapoints, downsampled across 7 granularities,
with derived streams maintained by 4 operators. This package re-expresses
those semantics Spark-first:

- ``session``      — SparkSession factory with scale-oriented defaults
- ``granularity``  — the 7 reference granularities + epoch-aligned bucketing
- ``sources``      — testdata / table loaders (incl. parquet-NANOS shim)
- ``plans``        — declarative query builders (conformance queries §2b)
- ``operators``    — downsample / derive / dedup / similarity operators
- ``functions``    — scalar/aggregate helpers (time, json, text)
- ``api``          — Datastream-compatible facade (ensure_stream/append/
                     get_data/find_streams/downsample_streams)
- ``streaming``    — incremental ingest + downsample (Structured Streaming)
"""

__version__ = "0.1.0"
