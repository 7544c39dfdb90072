"""Python DataSource streaming sink (sources/python_sink.py): two-phase
commit semantics, retry idempotency, checkpointed re-run no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.sources.python_sink import (
    AUDIT_SINK_SCHEMA,
    commit_batch_dir,
    register_audit_sink,
)

from .conftest import SF_SMALL


def _stage(tmp_path, name: str, lines: list[str]) -> str:
    staging = tmp_path / ".staging"
    staging.mkdir(exist_ok=True)
    p = staging / name
    p.write_text("".join(f"{ln}\n" for ln in lines))
    return str(p)


def test_commit_replaces_prior_batch_dir(tmp_path):
    """A retried batch rebuilds its directory from the retry's staged
    files only — no accumulation from the failed attempt."""
    first = _stage(tmp_path, "a.csv", ["1,10", "2,20"])
    commit_batch_dir(str(tmp_path), 7, [first])
    retry = _stage(tmp_path, "b.csv", ["1,10"])
    commit_batch_dir(str(tmp_path), 7, [retry])
    batch = tmp_path / "batch=7"
    files = sorted(os.listdir(batch))
    assert files == ["part-00000.csv"]
    assert (batch / "part-00000.csv").read_text() == "1,10\n"
    # staged files consumed
    assert os.listdir(tmp_path / ".staging") == []


def test_commit_is_all_or_nothing_ordering(tmp_path):
    """The final directory appears only via os.replace of a fully
    populated temp dir — a reader never observes a partial batch."""
    staged = [
        _stage(tmp_path, f"f{i}.csv", [f"{i},1"]) for i in range(3)
    ]
    commit_batch_dir(str(tmp_path), 0, staged)
    batch = tmp_path / "batch=0"
    assert sorted(os.listdir(batch)) == [
        "part-00000.csv",
        "part-00001.csv",
        "part-00002.csv",
    ]
    # no leftover .commit-* temp dirs
    assert not [d for d in os.listdir(tmp_path) if d.startswith(".commit-")]


def test_stream_sink_end_to_end_and_rerun_noop(spark, tmp_path):
    """All rows arrive exactly once through the sink; a second run on
    the SAME checkpoint admits no new data and leaves the committed
    rows byte-identical."""
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        _docs_chunk_dir,
    )

    register_audit_sink(spark)
    src = _docs_chunk_dir(spark, SF_SMALL)
    schema = spark.read.parquet(src).schema
    sink_dir = str(tmp_path / "rows")
    os.makedirs(sink_dir)
    ckpt = str(tmp_path / "ckpt")

    def run() -> None:
        docs = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        (
            docs.select("doc_id", F.length("text").alias("n"))
            .writeStream.format("audit_sink")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    read = lambda: sorted(  # noqa: E731
        (r["doc_id"], r["n_tokens"])
        for r in spark.read.schema(AUDIT_SINK_SCHEMA)
        .csv(os.path.join(sink_dir, "batch=*"))
        .collect()
    )
    got = read()
    want = sorted(
        (r["doc_id"], r["n"])
        for r in spark.read.parquet(src)
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    )
    assert got == want
    n_batches = len(
        [d for d in os.listdir(sink_dir) if d.startswith("batch=")]
    )
    assert n_batches >= 2  # maxFilesPerTrigger=1 over 3 chunks
    run()  # same checkpoint: no new data, nothing rewritten
    assert read() == want
    assert (
        len([d for d in os.listdir(sink_dir) if d.startswith("batch=")])
        == n_batches
    )
