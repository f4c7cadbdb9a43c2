"""Storage abstraction for the Delta-log control plane.

The reference is storage-agnostic: ``DeltaLog.forTable(conf, path)``
(`DeltaReader.java:301-303`) works on any Hadoop filesystem, including
S3A (its `core-site.xml` configures an S3 endpoint). This module gives
our log layer the same property: every control-plane I/O in
``DeltaTable`` — listing the log, reading/writing commits and
checkpoints, publishing staged data files — goes through the
``FileSystem`` interface below instead of raw POSIX calls.

Only the *control plane* is abstracted. Data-plane reads are issued by
Spark itself (``spark.read.parquet``), which is already storage-agnostic
via Hadoop filesystems, and executor-side staged writes go to whatever
store the table path names.

Commit protocol by backend
--------------------------

The one operation whose semantics differ across stores is
``create_exclusive`` — publish a commit file *iff* it does not exist
(mutual exclusion between concurrent committers of the same version):

- **Local / POSIX** (implemented here): ``open(path, "x")`` — O_EXCL is
  atomic on a local filesystem and on NFSv3+.
- **S3** (documented, not shipped in this sandbox): a conditional PUT
  with ``If-None-Match: *`` — atomic compare-and-set on object creation
  (supported by S3 since 2024, and by GCS/Azure for years). Before
  conditional PUT, the ecosystem used an external mutex (the
  DynamoDB-backed LogStore of delta-rs / S3DynamoDBLogStore): acquire
  ``(table, version)`` in a strongly-consistent table, write the object,
  release. Either strategy plugs in as an S3FileSystem implementing
  ``create_exclusive``; everything else maps 1:1 to LIST / GET / PUT /
  DELETE, and ``move`` becomes copy+delete (staged files are invisible
  until the commit publishes their paths, so the non-atomic rename is
  safe).

Listing consistency: S3 LIST is strongly consistent (since 2020), so
``listdir`` of ``_delta_log/`` is a correct version discovery — no
read-after-write hazard.
"""

from __future__ import annotations

import io
import os
import posixpath
import shutil
import threading
import time
from collections.abc import Iterator


class FileSystem:
    """Minimal filesystem surface the Delta log layer needs.

    Paths are plain strings; implementations interpret them for their
    backend. All methods raise their backend's native errors except
    ``create_exclusive``, which must raise FileExistsError when the
    target already exists (that error IS the concurrency-control
    signal)."""

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text(self, path: str, data: str) -> None:
        """Overwrite-allowed put (e.g. ``_last_checkpoint``)."""
        raise NotImplementedError

    def create_exclusive(self, path: str, data: str) -> None:
        """Publish ``data`` at ``path`` iff absent, atomically.
        Raises FileExistsError if the path exists — the losing side of
        optimistic concurrency."""
        raise NotImplementedError

    def open_read(self, path: str):
        """Binary file-like for parquet reads (pyarrow-compatible)."""
        raise NotImplementedError

    def open_write(self, path: str):
        """Binary file-like for parquet writes (pyarrow-compatible)."""
        raise NotImplementedError

    def move(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def mtime_ms(self, path: str) -> int:
        raise NotImplementedError

    def walk_files(self, path: str) -> Iterator[str]:
        """Yield every file path under ``path`` (recursive)."""
        raise NotImplementedError


class LocalFileSystem(FileSystem):
    """POSIX implementation; hard-link put-if-absent provides the
    commit mutex (``create_exclusive`` needs link(2) — filesystems
    without hard-link support need a different FileSystem impl)."""

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def write_text(self, path: str, data: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(data)

    def create_exclusive(self, path: str, data: str) -> None:
        # Publish atomically: `open(path, "x")` + write makes the name
        # visible EMPTY before the body lands, so a snapshot replay
        # racing a commit can read a partial commit file and silently
        # drop its actions (observed as a .crc/replay mismatch under
        # concurrent committers, r16). Write-to-temp + os.link is POSIX
        # put-if-absent: the final name appears only with its complete
        # content, and the loser of the race gets FileExistsError from
        # link(2) exactly as before.
        # The tmp write sits inside the same try/finally (ADVICE r16):
        # a failed write (ENOSPC, interrupt) must not leak the .tmp —
        # the finally unlinks it whether the write or the link failed.
        # Requires hard-link support (true of the POSIX local
        # filesystems this class is scoped to; see class docstring).
        tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp"
        try:
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(data)
            os.link(tmp, path)
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def open_read(self, path: str):
        return open(path, "rb")

    def open_write(self, path: str):
        return open(path, "wb")

    def move(self, src: str, dst: str) -> None:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(src, dst)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def mtime_ms(self, path: str) -> int:
        return int(os.path.getmtime(path) * 1000)

    def walk_files(self, path: str) -> Iterator[str]:
        for root, _dirs, files in os.walk(path):
            for name in files:
                yield os.path.join(root, name)


class InMemoryFileSystem(FileSystem):
    """Dict-backed object-store model: strongly consistent LIST, atomic
    create-if-absent (the conditional-PUT CAS an S3-style backend
    provides), flat key space with directory markers.

    Two testing affordances:
    - a single lock makes every operation linearizable, so thread races
      hit the OCC protocol, not Python-level data corruption;
    - ``on_create_exclusive`` (callable ``(path, data) -> None``) fires
      INSIDE the lock before the existence check, letting tests inject
      a deterministic racer at the exact conditional-create window.

    Proves the commit protocol (``DeltaTable._commit`` retry loops)
    against a second ``create_exclusive`` implementation, per the
    storage-agnostic contract the reference inherits from Hadoop
    (``DeltaReader.java:301-303``)."""

    def __init__(self) -> None:
        self._files: dict[str, bytes] = {}
        self._mtimes: dict[str, float] = {}
        self._dirs: set[str] = set()
        self._lock = threading.RLock()
        self.on_create_exclusive = None

    @staticmethod
    def _norm(path: str) -> str:
        return posixpath.normpath(path)

    def _add_dir_chain(self, path: str) -> None:
        d = self._norm(path)
        while d not in ("/", "", "."):
            self._dirs.add(d)
            d = posixpath.dirname(d)

    def isdir(self, path: str) -> bool:
        p = self._norm(path)
        with self._lock:
            return p in self._dirs

    def exists(self, path: str) -> bool:
        p = self._norm(path)
        with self._lock:
            return p in self._files or p in self._dirs

    def listdir(self, path: str) -> list[str]:
        p = self._norm(path)
        with self._lock:
            if p not in self._dirs:
                raise FileNotFoundError(p)
            out = set()
            for k in list(self._files) + list(self._dirs):
                if posixpath.dirname(k) == p:
                    out.add(posixpath.basename(k))
            return sorted(out)

    def makedirs(self, path: str) -> None:
        with self._lock:
            self._add_dir_chain(path)

    def read_text(self, path: str) -> str:
        p = self._norm(path)
        with self._lock:
            if p not in self._files:
                raise FileNotFoundError(p)
            return self._files[p].decode("utf-8")

    def _put(self, path: str, data: bytes) -> None:
        p = self._norm(path)
        self._files[p] = data
        self._mtimes[p] = time.time()
        self._add_dir_chain(posixpath.dirname(p))

    def write_text(self, path: str, data: str) -> None:
        with self._lock:
            self._put(path, data.encode("utf-8"))

    def create_exclusive(self, path: str, data: str) -> None:
        p = self._norm(path)
        with self._lock:
            if self.on_create_exclusive is not None:
                self.on_create_exclusive(path, data)
            if p in self._files:
                raise FileExistsError(p)
            self._put(p, data.encode("utf-8"))

    def open_read(self, path: str):
        p = self._norm(path)
        with self._lock:
            if p not in self._files:
                raise FileNotFoundError(p)
            return io.BytesIO(self._files[p])

    def open_write(self, path: str):
        fs = self

        class _Writer(io.BytesIO):
            def close(self2) -> None:
                with fs._lock:
                    fs._put(path, self2.getvalue())
                io.BytesIO.close(self2)

        return _Writer()

    def move(self, src: str, dst: str) -> None:
        s, d = self._norm(src), self._norm(dst)
        with self._lock:
            if s not in self._files:
                raise FileNotFoundError(s)
            self._put(d, self._files.pop(s))
            self._mtimes[d] = self._mtimes.pop(s, time.time())

    def remove(self, path: str) -> None:
        p = self._norm(path)
        with self._lock:
            if p not in self._files:
                raise FileNotFoundError(p)
            del self._files[p]
            self._mtimes.pop(p, None)

    def rmtree(self, path: str) -> None:
        p = self._norm(path)
        with self._lock:
            for k in [k for k in self._files if k == p or k.startswith(p + "/")]:
                del self._files[k]
                self._mtimes.pop(k, None)
            self._dirs = {d for d in self._dirs if not (d == p or d.startswith(p + "/"))}

    def size(self, path: str) -> int:
        p = self._norm(path)
        with self._lock:
            return len(self._files[p])

    def mtime_ms(self, path: str) -> int:
        p = self._norm(path)
        with self._lock:
            return int(self._mtimes[p] * 1000)

    def walk_files(self, path: str) -> Iterator[str]:
        p = self._norm(path)
        with self._lock:
            return iter(
                sorted(k for k in self._files if k == p or k.startswith(p + "/"))
            )
