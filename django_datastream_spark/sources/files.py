"""File-format ingest sources (reference: SURVEY §2.8 source abstraction
— the reference ingests only via its HTTP/Python append API; a Spark
engine is expected to bulk-load from files too). CSV and JSON-lines
readers that produce ``INGEST_SCHEMA`` rows for
``StreamingIngest.ingest_dataframe`` (batch) or ``.attach`` (streaming),
with malformed rows *quarantined, never dropped silently*.

Scale notes: both readers hand Spark an explicit schema, so there is no
sampling/inference pass over the data (inference reads the whole input
twice at 100 TB). Corrupt-record capture is Spark's PERMISSIVE mode —
the scan stays a single pass, bad rows carry their raw text into a side
output. File listing parallelizes on the cluster; pass directories, not
driver-side file lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..streaming.ingest import INGEST_SCHEMA

_CORRUPT = "_corrupt_record"

# INGEST_SCHEMA + the PERMISSIVE-mode capture column
_READ_SCHEMA = T.StructType(
    list(INGEST_SCHEMA.fields) + [T.StructField(_CORRUPT, T.StringType())]
)


def read_ingest_csv(
    spark: SparkSession,
    path: str,
    streaming: bool = False,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV → INGEST_SCHEMA rows plus ``_corrupt_record`` (null for good
    rows; the raw line for malformed ones). ``split_quarantine`` divides
    the two. Timestamps must be ISO-8601 (Spark's default parser)."""
    reader = spark.readStream if streaming else spark.read
    return reader.schema(_READ_SCHEMA).csv(
        path,
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=_CORRUPT,
        **options,
    )


def read_ingest_jsonl(
    spark: SparkSession, path: str, streaming: bool = False, **options
) -> DataFrame:
    """JSON-lines → INGEST_SCHEMA rows plus ``_corrupt_record``."""
    reader = spark.readStream if streaming else spark.read
    return reader.schema(_READ_SCHEMA).json(
        path,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=_CORRUPT,
        **options,
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good INGEST_SCHEMA rows, quarantined raw rows).

    Good = parsed cleanly AND carries the two required fields; a row
    missing stream_id/ts is quarantined even when syntactically valid
    (mirrors the validation the streaming pipeline applies to appends).
    """
    ok = (
        F.col(_CORRUPT).isNull()
        & F.col("stream_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    good = df.filter(ok).select(*[f.name for f in INGEST_SCHEMA.fields])
    bad = df.filter(~ok).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct("*"))).alias("raw")
    )
    return good, bad
