"""Small-file compaction for parquet table directories.

High-frequency streaming appends (A4/A7 sinks) fragment a table into
thousands of tiny part files; at 100 TB the scan's file-listing and
footer reads dominate. Compaction rewrites a directory to a target file
count. The rewrite stages into a sibling temp dir and swaps via two
renames. NOTE: the swap is NOT atomic — POSIX rename cannot atomically
exchange two directories, so there is a window between the two renames
where ``path`` does not exist, and a crash in that window strands the
table under the ``__old_*`` backup name (recoverable by renaming it
back). A production table format gets atomicity from a metadata pointer
flip (Delta/Iceberg snapshot, or a versioned dir + symlink flip); for a
plain parquet dir this staged-rename is the closest safe approximation.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession, path: str, target_files: int = 8
) -> dict:
    """Rewrite ``path`` (a parquet dir) into ``target_files`` files.

    Uses coalesce (narrow — no shuffle: each output file concatenates
    input splits). Returns {files_before, files_after, rows}.
    """
    files_before = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    df = spark.read.parquet(path)
    rows = df.count()
    staged = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(target_files).write.mode("overwrite").parquet(staged)
    backup = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staged, path)
    shutil.rmtree(backup)
    files_after = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
    }
