"""sources/cachedir.py + sources/fsutil.py unit tests."""

from __future__ import annotations

import os
import threading
import time

from big_data_analysis_diseases_outbreaks_spark.sources.cachedir import (
    build_cached_dir,
    source_fingerprint,
)


def _unique_prefix() -> str:
    return f"sparktest_cache_{os.getpid()}_{time.monotonic_ns()}"


def test_build_once_and_reuse(tmp_path):
    prefix = _unique_prefix()
    calls = []

    def build(d):
        calls.append(d)
        open(os.path.join(d, "data.txt"), "w").write("v1")

    d1 = build_cached_dir(prefix, "fp1", build)
    d2 = build_cached_dir(prefix, "fp1", build)
    assert d1 == d2
    assert len(calls) == 1, "second call must hit the cache"
    assert open(os.path.join(d1, "data.txt")).read() == "v1"
    assert os.path.exists(os.path.join(d1, "_DONE"))


def test_fingerprint_change_rebuilds_and_prunes(tmp_path):
    prefix = _unique_prefix()
    built = []

    def mk(tag):
        def build(d):
            built.append(tag)
            open(os.path.join(d, "data.txt"), "w").write(tag)

        return build

    d1 = build_cached_dir(prefix, "fpA", mk("A"))
    d2 = build_cached_dir(prefix, "fpB", mk("B"))
    assert d1 != d2
    assert built == ["A", "B"]
    assert open(os.path.join(d2, "data.txt")).read() == "B"
    # A FRESHLY superseded published dir survives the prune: another
    # process that resolved it before the source regenerated may still
    # be streaming files from it (ADVICE r6).
    assert os.path.exists(d1)
    # Past the reap cutoff it IS reclaimed (no unbounded /tmp growth).
    from big_data_analysis_diseases_outbreaks_spark.sources.cachedir import (
        _STAGING_REAP_SECONDS,
    )

    old = time.time() - _STAGING_REAP_SECONDS - 60
    os.utime(d1, (old, old))
    d3 = build_cached_dir(prefix, "fpC", mk("C"))
    assert os.path.exists(d3)
    assert not os.path.exists(d1)


def test_failed_build_leaves_no_cache(tmp_path):
    prefix = _unique_prefix()

    def bad(d):
        open(os.path.join(d, "partial.txt"), "w").write("x")
        raise RuntimeError("boom")

    try:
        build_cached_dir(prefix, "fp1", bad)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass
    # Neither a final dir nor a staging leftover.
    import glob
    import tempfile

    leftovers = glob.glob(os.path.join(tempfile.gettempdir(), f"{prefix}-*"))
    assert leftovers == []
    # And the next attempt builds fresh.
    ok = []
    build_cached_dir(prefix, "fp1", lambda d: ok.append(d))
    assert len(ok) == 1


def test_legacy_partial_dir_is_replaced(tmp_path):
    """A dir squatting on the final name WITHOUT _DONE (old scheme /
    killed build) must be replaced, not trusted."""
    import tempfile

    prefix = _unique_prefix()
    final = os.path.join(tempfile.gettempdir(), f"{prefix}-fp1")
    os.makedirs(final)
    open(os.path.join(final, "stale.txt"), "w").write("stale")

    d = build_cached_dir(
        prefix, "fp1", lambda s: open(os.path.join(s, "fresh.txt"), "w").close()
    )
    assert d == final
    assert os.path.exists(os.path.join(d, "fresh.txt"))
    assert not os.path.exists(os.path.join(d, "stale.txt"))


def test_concurrent_builders_one_complete_result():
    prefix = _unique_prefix()
    results, errors = [], []

    def build(d):
        time.sleep(0.05)  # widen the race window
        open(os.path.join(d, "data.txt"), "w").write("v")

    def worker():
        try:
            results.append(build_cached_dir(prefix, "fp1", build))
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert len(set(results)) == 1
    d = results[0]
    assert open(os.path.join(d, "data.txt")).read() == "v"
    assert os.path.exists(os.path.join(d, "_DONE"))


def test_source_fingerprint_tracks_content_version(tmp_path):
    src = tmp_path / "s.parquet"
    src.write_bytes(b"abc")
    fp1 = source_fingerprint(str(src))
    assert fp1 == source_fingerprint(str(src))
    time.sleep(0.01)
    src.write_bytes(b"abcd")
    assert source_fingerprint(str(src)) != fp1


# --- fsutil (Hadoop FileSystem probes) -------------------------------------


def test_fsutil_probes_local_paths(spark, tmp_path):
    from big_data_analysis_diseases_outbreaks_spark.sources.fsutil import (
        delete_path,
        dir_has_data,
        list_names,
        path_exists,
    )

    d = tmp_path / "t"
    assert not path_exists(spark, str(d))
    assert list_names(spark, str(d)) == []
    assert not dir_has_data(spark, str(d))
    d.mkdir()
    (d / "_SUCCESS").write_text("")
    assert path_exists(spark, str(d))
    assert not dir_has_data(spark, str(d)), "marker files are not data"
    (d / "part-0.parquet").write_text("x")
    assert dir_has_data(spark, str(d))
    assert sorted(list_names(spark, str(d))) == ["_SUCCESS", "part-0.parquet"]
    assert delete_path(spark, str(d))
    assert not path_exists(spark, str(d))


# --- recipe constants are part of the graph-MV cache identity ---------------
# ADVICE r10(b) regression: changing COPURCHASE_SHIPDATE_LO (the edge
# recipe) must change the cache key WITHOUT a manual version bump —
# otherwise all seven *_mv twins silently serve stale edges.


def test_graph_mv_cache_key_tracks_recipe_constants(monkeypatch, tmp_path):
    from big_data_analysis_diseases_outbreaks_spark.queries import relational as rel

    captured: list[str] = []

    def fake_build_cached_dir(name, fingerprint, build, **kw):
        captured.append(name)
        return str(tmp_path)

    monkeypatch.setattr(
        "big_data_analysis_diseases_outbreaks_spark.sources.cachedir"
        ".build_cached_dir",
        fake_build_cached_dir,
    )
    monkeypatch.setattr(
        "big_data_analysis_diseases_outbreaks_spark.sources.cachedir"
        ".source_fingerprint",
        lambda src: "fp",
    )
    sf = os.path.join(os.path.dirname(__file__), "data", "sf0.001")
    if not os.path.isdir(os.path.join(sf, "lineitem.parquet")):
        sf = "/root/testdata/sf0.001"
    rel._graph_mv_dir(None, sf)
    monkeypatch.setattr(rel, "COPURCHASE_SHIPDATE_LO", "1997-06-01")
    rel._graph_mv_dir(None, sf)
    assert len(captured) == 2
    assert captured[0] != captured[1], (
        "edge-recipe constant changed but cache identity did not: "
        f"{captured}"
    )
    assert "1997-06-01" in captured[1]
