"""Filesystem probes that work on any Hadoop-supported URI.

Driver-side ``os.path`` checks silently return False for non-local URIs
(HDFS/S3/...), which turns "does the seen-store exist yet?" gates into
always-bootstrap paths — cross-batch dedup would silently stop working
the day the pipeline moves off the local disk (ADVICE r5, medium).
These helpers go through Spark's Hadoop ``FileSystem`` API, so the same
code answers correctly for ``/tmp/x``, ``hdfs://...`` and ``s3a://...``.

Classic (JVM-backed) PySpark only — they reach the Hadoop conf through
``spark.sparkContext``; Spark Connect would need a listFiles-based
fallback, which this engine does not target.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its (URI-scheme-resolved) filesystem."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of ``path`` ([] when it does not exist)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path``; True iff something was deleted."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.delete(jpath, True))


def dir_has_data(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists and has a child that is not a ``_`` marker
    (``_SUCCESS``, ``_checkpoint``, ``_DONE``...)."""
    return any(not n.startswith("_") for n in list_names(spark, path))
