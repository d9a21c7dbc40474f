"""Filesystem seam for the streaming/maintenance paths (VERDICT r4 #4).

The streaming ingest and ``compact_pyramid`` need a handful of filesystem
primitives (list a level dir, atomically publish a file, swap a directory).
In the sandbox those are POSIX calls; on an object store (s3a) the same
operations have different commit semantics — there is no atomic rename, so
the portable contract is:

- **file publish**: deterministic final names make blind PUTs idempotent
  (a retried task overwrites with identical bytes — last-writer-wins). The
  local impl gets the same effect with temp-file + ``os.replace``; an
  object-store impl writes the object directly (PUT is already atomic).
- **directory swap** (compaction): objects cannot be renamed in place, so a
  real deployment swaps via a *manifest pointer* (write the new level under
  a versioned prefix, then commit the pointer — exactly what an Iceberg
  snapshot commit does). The local impl uses two renames and documents the
  crash window; ``swap_dir`` is the single seam a real catalog replaces.

Everything here must stay **picklable** (instances ship inside executor
closures) and dependency-light. A pyarrow.fs-backed implementation slots in
by subclassing ``LocalFS`` and overriding these methods; nothing above this
module changes.
"""

from __future__ import annotations

import os
import shutil


class LocalFS:
    """POSIX implementation — the sandbox default."""

    def listdir(self, d: str) -> list[str]:
        """Names in ``d``; [] if the directory doesn't exist."""
        try:
            return os.listdir(d)
        except FileNotFoundError:
            return []

    def makedirs(self, d: str) -> None:
        os.makedirs(d, exist_ok=True)

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def getsize(self, p: str) -> int:
        return os.path.getsize(p)

    def publish_file(self, d: str, fname: str, write_fn) -> None:
        """Atomically publish ``d/fname``: ``write_fn(tmp_path)`` writes the
        bytes, then one ``os.replace`` makes them visible — readers never
        observe a torn file, retried writers last-writer-win. Object-store
        impls call ``write_fn`` against a buffer/stream and PUT directly
        (the PUT is the atomic publish)."""
        tmp = os.path.join(d, f".{fname}.inprogress-{os.getpid()}")
        write_fn(tmp)
        os.replace(tmp, os.path.join(d, fname))

    def swap_dir(self, new: str, live: str, backup: str) -> None:
        """Swap ``new`` into ``live``'s place keeping ``backup`` until the
        swap completes, then drop it. Crash between the renames leaves
        ``backup`` on disk — rename it back to recover (documented in
        ``compact_pyramid``). Object-store impls replace this with a
        manifest-pointer commit (versioned prefix + pointer write)."""
        os.rename(live, backup)
        os.rename(new, live)
        shutil.rmtree(backup)

    def remove(self, p: str) -> None:
        """Delete one file; missing is fine (idempotent cleanup)."""
        try:
            os.remove(p)
        except FileNotFoundError:
            pass

    def rmtree(self, d: str) -> None:
        shutil.rmtree(d, ignore_errors=True)


#: module default used when no fs is passed — tests inject mocks instead
DEFAULT_FS = LocalFS()
