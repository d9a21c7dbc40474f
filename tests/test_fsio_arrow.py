"""ArrowFS: the pyarrow.fs-backed fsio implementation (VERDICT r5 #6).

The seam's claim is "an object-store impl slots in by subclassing" — these
tests demonstrate it end-to-end against ``pyarrow.fs.LocalFileSystem``:
the full streaming ingest + ancestor patch + terminal compaction runs
green under ArrowFS and produces values identical to the POSIX LocalFS
path, executors receive the injected subclass (pickled by URI, hydrated
per process), and the manifest-pointer swap recovers from a crash between
the marker commit and its materialization.
"""

import glob
import json
import os

import numpy as np
import pytest

from pyramidscheme_jl_spark.sources.fsio import ArrowFS, LocalFS
from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images
from pyramidscheme_jl_spark.streaming.ingest import compact_pyramid, ingest_images


def _run_pipeline(spark, tmp_path, tag, fs):
    """Two-batch ingest (second batch rewrites image 0 — exercises the
    ancestor-patch publishes) + terminal compaction, all through ``fs``."""
    from pyramidscheme_jl_spark.functions.codec import encode_tile
    from pyramidscheme_jl_spark.sources.synth import image_row

    src = tmp_path / f"src_{tag}"
    src.mkdir()
    spark.createDataFrame(synth_images(G=4), IMAGES_DDL).coalesce(2).write.parquet(
        str(src / "b0")
    )
    path = str(tmp_path / f"pyr_{tag}")
    ingest_images(spark, f"{src}/*", path, G=4, fs=fs).awaitTermination(180)
    repl = dict(image_row(0, G=4))
    repl["bytes"] = encode_tile(np.full((256, 256), 7, dtype=np.uint8))
    spark.createDataFrame([repl], IMAGES_DDL).coalesce(1).write.parquet(str(src / "b1"))
    ingest_images(spark, f"{src}/*", path, G=4, fs=fs).awaitTermination(180)
    compact_pyramid(spark, path, run_id=f"c-{tag}", fs=fs)
    return path


def test_arrow_fs_streaming_and_compaction_matches_localfs(spark, tmp_path):
    from pyramidscheme_jl_spark.sources.catalog import read_level

    # executor-side injection proof: a subclass that drops a hidden marker
    # next to every published object, shipped to executors by value
    class MarkerArrowFS(ArrowFS):
        def publish_file(self, d, fname, write_fn):
            # fname may be a callable (content-derived names); the base
            # impl resolves it and returns the final name
            final = super().publish_file(d, fname, write_fn)
            with self._fs().open_output_stream(
                os.path.join(d, f".amarker-{final}")
            ) as f:
                f.write(b"1")
            return final

    p_arrow = _run_pipeline(spark, tmp_path, "arrow", MarkerArrowFS())
    p_local = _run_pipeline(spark, tmp_path, "local", LocalFS())

    # compaction went through the pointer swap and cleaned up after itself
    assert not glob.glob(f"{p_arrow}/tiles/.swap-commit-*")
    assert not glob.glob(f"{p_arrow}/tiles/_compact_tmp_z*")
    for z in (0, 1, 2):
        assert glob.glob(f"{p_arrow}/tiles/z={z}/part-*.parquet")
        a = sorted(
            (r["tx"], r["ty"], r["vmean"], r["bytes"])
            for r in read_level(spark, p_arrow, z).collect()
        )
        b = sorted(
            (r["tx"], r["ty"], r["vmean"], r["bytes"])
            for r in read_level(spark, p_local, z).collect()
        )
        assert a == b, f"level {z} diverges between ArrowFS and LocalFS"


def test_arrow_fs_publish_streams_exact_bytes(tmp_path):
    fs = ArrowFS()
    d = str(tmp_path / "pub")
    fs.makedirs(d)
    payload = os.urandom(1 << 20)

    def write(tmp):
        with open(tmp, "wb") as f:
            f.write(payload)

    fs.publish_file(d, "obj.bin", write)
    assert open(os.path.join(d, "obj.bin"), "rb").read() == payload
    assert fs.getsize(os.path.join(d, "obj.bin")) == len(payload)
    # retried publish (same deterministic name) last-writer-wins, no error
    fs.publish_file(d, "obj.bin", write)
    assert sorted(fs.listdir(d)) == ["obj.bin"]


def test_arrow_fs_swap_crash_recovery(tmp_path):
    """Crash after the marker PUT but before materialization: the marker
    IS the commit — ``recover_swap`` replays it to completion; a second
    recover is a no-op."""
    fs = ArrowFS()
    live, new = str(tmp_path / "z=0"), str(tmp_path / "_tmp_z0")
    fs.makedirs(live)
    fs.makedirs(new)
    open(os.path.join(live, "delta-stale.parquet"), "wb").write(b"old")
    open(os.path.join(live, ".hidden-marker"), "wb").write(b"x")
    open(os.path.join(new, "part-0.parquet"), "wb").write(b"A" * 128)
    open(os.path.join(new, "part-1.parquet"), "wb").write(b"B" * 64)

    class CrashFS(ArrowFS):
        def _materialize_swap(self, marker):
            raise RuntimeError("simulated crash after commit")

    with pytest.raises(RuntimeError, match="simulated crash"):
        CrashFS().swap_dir(new, live, str(tmp_path / "bak"))

    marker = str(tmp_path / ".swap-commit-z=0")
    assert os.path.exists(marker)
    rec = json.loads(open(marker).read())
    assert rec["files"] == ["part-0.parquet", "part-1.parquet"]
    # pre-recovery: live still holds the stale file (no torn rename state)
    assert os.path.exists(os.path.join(live, "delta-stale.parquet"))

    assert fs.recover_swap(live) is True
    assert sorted(os.listdir(live)) == ["part-0.parquet", "part-1.parquet"]
    assert open(os.path.join(live, "part-0.parquet"), "rb").read() == b"A" * 128
    assert not os.path.exists(marker) and not os.path.exists(new)
    assert fs.recover_swap(live) is False  # nothing pending


def test_arrow_fs_pickles_by_uri():
    import pickle

    fs = ArrowFS()
    fs._fs()  # hydrate the unpicklable handle
    clone = pickle.loads(pickle.dumps(fs))
    assert clone.uri == "local" and clone._cached is None
    assert clone.exists("/")  # rehydrates lazily


def test_arrow_fs_publish_local_is_atomic(tmp_path):
    """ADVICE r6: on a local-path backend an output stream is not an
    atomic PUT — publish must stage under a dot-prefixed name (invisible
    to streaming readers) and rename into place. The final name must
    never be opened as a stream target."""
    stream_targets = []

    class SpyFS(ArrowFS):
        def _stream_to(self, local_src, dest):
            stream_targets.append(dest)
            super()._stream_to(local_src, dest)

    fs = SpyFS()
    d = str(tmp_path / "lvl")
    fs.makedirs(d)
    payload = os.urandom(1 << 16)

    def write(tmp):
        open(tmp, "wb").write(payload)

    fs.publish_file(d, "part-0.parquet", write)
    assert open(os.path.join(d, "part-0.parquet"), "rb").read() == payload
    # the stream target was the dot-staged name, not the final one
    assert len(stream_targets) == 1
    assert os.path.basename(stream_targets[0]).startswith(".")
    # no stage leftovers
    assert sorted(fs.listdir(d)) == ["part-0.parquet"]
    # a retried publish still last-writer-wins
    fs.publish_file(d, "part-0.parquet", write)
    assert sorted(fs.listdir(d)) == ["part-0.parquet"]


def test_recover_pending_swaps_marker_and_posix(tmp_path):
    """ADVICE r6: a crash between the marker PUT and materialization must
    self-heal at the next production entry — ``recover_pending_swaps``
    replays ArrowFS markers AND finishes/rolls back LocalFS two-rename
    windows, without a manual ``recover_swap`` call."""
    from pyramidscheme_jl_spark.streaming.ingest import recover_pending_swaps

    # --- ArrowFS marker replay ------------------------------------------
    fs = ArrowFS()
    path = str(tmp_path / "pyr")
    tiles = os.path.join(path, "tiles")
    live, new = os.path.join(tiles, "z=0"), os.path.join(tiles, "_compact_tmp_z0")
    fs.makedirs(live)
    fs.makedirs(new)
    open(os.path.join(live, "delta-stale.parquet"), "wb").write(b"old")
    open(os.path.join(new, "part-0.parquet"), "wb").write(b"NEW")

    class CrashFS(ArrowFS):
        def _materialize_swap(self, marker):
            raise RuntimeError("crash")

    with pytest.raises(RuntimeError):
        CrashFS().swap_dir(new, live, os.path.join(tiles, "_compact_old_z0"))
    assert recover_pending_swaps(path, fs) == 1
    assert sorted(os.listdir(live)) == ["part-0.parquet"]
    assert recover_pending_swaps(path, fs) == 0  # idempotent

    # --- LocalFS window: crash between the two renames -------------------
    lfs = LocalFS()
    path2 = str(tmp_path / "pyr2")
    tiles2 = os.path.join(path2, "tiles")
    tmp2 = os.path.join(tiles2, "_compact_tmp_z1")
    bak2 = os.path.join(tiles2, "_compact_old_z1")
    os.makedirs(tmp2)
    os.makedirs(bak2)
    open(os.path.join(tmp2, "part-0.parquet"), "wb").write(b"NEW")
    open(os.path.join(bak2, "delta-old.parquet"), "wb").write(b"old")
    assert recover_pending_swaps(path2, lfs) == 1
    live2 = os.path.join(tiles2, "z=1")
    assert sorted(os.listdir(live2)) == ["part-0.parquet"]
    assert not os.path.exists(bak2) and not os.path.exists(tmp2)

    # --- LocalFS window: swap never started writing tmp → roll back ------
    path3 = str(tmp_path / "pyr3")
    tiles3 = os.path.join(path3, "tiles")
    bak3 = os.path.join(tiles3, "_compact_old_z2")
    os.makedirs(bak3)
    open(os.path.join(bak3, "delta-old.parquet"), "wb").write(b"old")
    assert recover_pending_swaps(path3, lfs) == 1
    assert sorted(os.listdir(os.path.join(tiles3, "z=2"))) == ["delta-old.parquet"]

    # --- LocalFS window: both renames done, rmtree pending → drop bak ----
    path4 = str(tmp_path / "pyr4")
    tiles4 = os.path.join(path4, "tiles")
    os.makedirs(os.path.join(tiles4, "z=3"))
    open(os.path.join(tiles4, "z=3", "part-0.parquet"), "wb").write(b"NEW")
    bak4 = os.path.join(tiles4, "_compact_old_z3")
    os.makedirs(bak4)
    open(os.path.join(bak4, "delta-old.parquet"), "wb").write(b"old")
    assert recover_pending_swaps(path4, lfs) == 1
    assert not os.path.exists(bak4)
    assert sorted(os.listdir(os.path.join(tiles4, "z=3"))) == ["part-0.parquet"]
