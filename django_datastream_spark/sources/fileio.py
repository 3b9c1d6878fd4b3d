"""Storage seam for the external-lakehouse metadata plane — READ and
WRITE.

Iceberg's own design vocabulary calls this FileIO: every *metadata*
byte a reader touches (Delta ``_delta_log`` listings / commit JSONs /
checkpoint parquet, Iceberg metadata JSON / manifest Avro, deletion-
vector sidecars — including decodes that run INSIDE executor tasks)
goes through one small injectable interface, so a table resident on
an object store needs a ~100-line adapter, not a FUSE mount.

Since round 11 the seam carries the WRITE verbs too, unified with the
commit-point contract of :class:`..txnlog.LogStore`: ``put_if_absent``
is the conditional PUT that decides a commit race (S3 now serves this
natively via ``If-None-Match: *``; stores without it use
:class:`..logstores.SqliteCoordinatedLogStore`), ``put_atomic`` lands
derived idempotent artifacts (checkpoints, version hints),
``put_bytes``/``delete``/``delete_prefix``/``move_file``/
``walk_files`` cover sidecars, staged-data promotion and maintenance
(VACUUM / orphan removal). Commit + data now share ONE storage
object: :func:`..logstores.log_store_for` adapts any FileIO into the
LogStore the write paths use, so ``publish``/sinks/OPTIMIZE/VACUUM
run end-to-end on a root that has no POSIX path.

The DATA plane stays with Spark: ``spark.read.parquet`` accepts any
Hadoop-compatible URI, so :meth:`FileIO.spark_path` only translates a
table path into the URI the JVM scan should use (identity for POSIX;
an s3a:// mapping for a real bucket; the backing dir for the test
double). This mirrors real deployments — metadata via an object SDK,
data via the Hadoop filesystem layer.

Resolution: public readers accept ``io=`` explicitly; when omitted,
:func:`io_for` dispatches on the path's URI scheme through a process-
local registry (plain paths and ``file:`` → :class:`LocalFileIO`).
EXECUTOR-SIDE code must never call :func:`io_for` — the registry is
driver-local; closures capture the resolved FileIO object instead
(every FileIO here is picklable by design).

:class:`FakeObjectStore` is the deployment double the interop suites
parameterize over: object-store semantics only (flat keys, whole-object
GET, ranged GET, prefix listing with ``start_after`` — S3
ListObjectsV2's StartAfter), list-after-write consistent, injectable
latency and per-call failures, and op counters so tests can pin
listing-cursor behavior (O(new commits) per streaming trigger, not
O(log size)).
"""

from __future__ import annotations

import os
import threading
import time


class FileIO:
    """Storage verbs for the metadata plane (reads + writes).

    Paths are full table-space paths (whatever the user handed the
    reader, e.g. ``/data/tbl/_delta_log`` or ``fake://tbl/metadata``);
    implementations own the mapping to their storage. All instances
    must be picklable — executor tasks receive them in closures.

    WRITE contract (round 11): ``put_bytes``/``put_atomic`` are plain
    single-object puts (atomic per object — a reader sees the old
    bytes or the new, never a torn write); ``put_if_absent`` is THE
    commit point (conditional PUT: create-if-absent, raising
    ``FileExistsError`` when the name exists — losing a commit race
    must surface, never last-writer-wins); ``delete`` is idempotent
    like S3 DeleteObject (missing is success); object stores
    implement ``makedirs``/``remove_empty_dirs`` as no-ops (they have
    no directories) and ``move_file`` as server-side copy + delete
    (no rename verb exists there).
    """

    # -- listing -------------------------------------------------------
    def list_dir(
        self, path: str, start_after: str | None = None
    ) -> list[str]:
        """Sorted child NAMES directly under ``path`` (files and
        "directories"), or [] when nothing is there. ``start_after``
        returns only names strictly greater — object stores serve
        this natively (key-range listing); callers use it to list
        O(new) instead of O(all) on hot logs. Raises FileNotFoundError
        only when the parent itself is missing AND the store can tell
        (object stores can't — they return [])."""
        raise NotImplementedError

    # -- reads ---------------------------------------------------------
    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        """``length`` bytes at ``offset`` (short only at EOF)."""
        raise NotImplementedError

    def read_text(self, path: str, encoding: str = "utf-8") -> str:
        return self.read_bytes(path).decode(encoding)

    # -- cheap predicates ----------------------------------------------
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        """Last-modified, seconds since epoch (S3 LastModified)."""
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    # -- writes (the write-side seam, round 11) -------------------------
    def put_bytes(self, path: str, data: bytes) -> None:
        """Plain single-object put — atomic per object, last writer
        wins (S3 PutObject). Parents spring into existence."""
        raise NotImplementedError

    def put_atomic(self, path: str, data: bytes) -> None:
        """Derived idempotent artifacts (checkpoints, hints):
        last-writer-wins is correct. Same atomicity as put_bytes;
        split out so POSIX stores can use tmp+rename while object
        stores alias it to a plain put."""
        self.put_bytes(path, data)

    def put_if_absent(self, path: str, data: bytes) -> None:
        """Conditional PUT — the COMMIT POINT. Create ``path`` with
        ``data`` iff no object exists there; raise
        ``FileExistsError(path)`` otherwise (= lost the commit race).
        S3 serves this natively (``If-None-Match: *``); POSIX via the
        ``os.link`` CAS; stores with neither need a coordinator
        (:class:`..logstores.SqliteCoordinatedLogStore`)."""
        raise NotImplementedError

    def delete(self, path: str, missing_ok: bool = True) -> None:
        """Delete one object. Idempotent by default (S3 DeleteObject
        on a missing key succeeds); ``missing_ok=False`` raises
        ``FileNotFoundError`` when nothing was there."""
        raise NotImplementedError

    def delete_prefix(self, path: str) -> None:
        """Recursively delete everything under ``path`` (list +
        batched deletes on an object store, rmtree on POSIX).
        Missing prefix is success."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        """Ensure ``path`` exists as a directory on stores that HAVE
        directories; a no-op on object stores (keys imply their
        prefixes)."""
        raise NotImplementedError

    def move_file(self, src: str, dst: str) -> None:
        """Move one object within THIS store (staged-data promotion).
        POSIX: rename. Object stores: server-side copy + delete —
        callers must treat the move as non-atomic (the commit point
        is put_if_absent on the log, never a data-file move)."""
        raise NotImplementedError

    def copy_file(self, src: str, dst: str) -> None:
        """Copy one object within THIS store (zero-copy clone's
        share-don't-move primitive). Default: read + put — overridden
        where the store has a cheaper form (POSIX hard link, S3
        CopyObject)."""
        self.put_bytes(dst, self.read_bytes(src))

    def walk_files(self, path: str) -> list[str]:
        """Every file under ``path`` (recursive) as sorted
        ``path``-relative paths; [] when nothing is there. One
        recursive listing on object stores; maintenance (VACUUM,
        orphan removal) sizes on this being metadata-plane."""
        raise NotImplementedError

    def remove_empty_dirs(self, path: str) -> None:
        """Prune empty directories under ``path`` (never ``path``
        itself). No-op on object stores — there is nothing to
        prune."""
        raise NotImplementedError

    # -- plane translation ----------------------------------------------
    def spark_path(self, path: str) -> str:
        """The URI Spark's JVM data plane scans for this path."""
        raise NotImplementedError

    def file_uri(self, path: str) -> str:
        """The DECODED form of the ``_metadata.file_path`` URI Spark
        reports for a file at ``path`` — what row-identity joins
        (deletion vectors, position deletes) compare against. Default
        handles plain POSIX paths and scheme URIs (Hadoop normalizes
        an empty authority to ``scheme:/path``)."""
        p = self.spark_path(path)
        if "://" not in p:
            return "file:" + os.path.abspath(p)
        scheme, rest = p.split("://", 1)
        if rest.startswith("/"):  # empty authority: file:///x -> file:/x
            return f"{scheme}:/{rest.lstrip('/')}"
        return p

    def parquet_source(self, path: str):
        """What ``pyarrow.parquet`` should be handed for a parquet at
        ``path``. Default: a SEEKABLE ranged reader — footer sniffs
        and stats collection must not buffer a whole (possibly
        multi-GB) data file; LocalFileIO returns the path so Arrow
        can mmap."""
        import pyarrow as pa

        return pa.PythonFile(_RangeFile(self, path), mode="r")


class LocalFileIO(FileIO):
    """POSIX paths (and FUSE mounts) — the default."""

    def list_dir(self, path, start_after=None):
        names = sorted(os.listdir(path))
        if start_after is not None:
            names = [n for n in names if n > start_after]
        return names

    def read_bytes(self, path):
        with open(path, "rb") as f:
            return f.read()

    def read_range(self, path, offset, length):
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(length)

    def exists(self, path):
        return os.path.exists(path)

    def mtime(self, path):
        return os.path.getmtime(path)

    def is_dir(self, path):
        return os.path.isdir(path)

    def size(self, path):
        return os.path.getsize(path)

    # -- writes ---------------------------------------------------------
    def put_bytes(self, path, data):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def put_atomic(self, path, data):
        import uuid

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def put_if_absent(self, path, data):
        # the os.link CAS (txnlog.LocalLogStore's recipe): content
        # lands COMPLETE under a unique name, then link atomically
        # claims the target — link fails iff the name exists
        import uuid

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def delete(self, path, missing_ok=True):
        try:
            os.unlink(path)
        except FileNotFoundError:
            if not missing_ok:
                raise

    def delete_prefix(self, path):
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def makedirs(self, path):
        os.makedirs(path, exist_ok=True)

    def move_file(self, src, dst):
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        os.replace(src, dst)

    def copy_file(self, src, dst):
        import shutil

        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        try:
            os.link(src, dst)  # zero-copy share (immutable files)
        except OSError:
            shutil.copy2(src, dst)  # cross-device fallback

    def walk_files(self, path):
        out = []
        for dirpath, _dirs, files in os.walk(path):
            for fn in files:
                out.append(
                    os.path.relpath(os.path.join(dirpath, fn), path)
                )
        return sorted(out)

    def remove_empty_dirs(self, path):
        for dirpath, _dirs, files in os.walk(path, topdown=False):
            if dirpath != path and not os.listdir(dirpath):
                os.rmdir(dirpath)

    def spark_path(self, path):
        return path

    def file_uri(self, path):
        return "file:" + os.path.abspath(path)

    def parquet_source(self, path):
        return path  # let Arrow mmap local metadata


class FakeObjectStoreError(RuntimeError):
    """Injected object-store failure (tests only). Deliberately NOT
    an OSError subclass: the readers' metadata fallbacks catch
    OSError (missing _last_checkpoint, absent version-hint), and an
    injected fault must propagate through them, not vanish into the
    fallback path it was built to test."""


class FakeObjectStore(FileIO):
    """Object-store double over a backing directory.

    Honest object semantics at the API: flat keys, whole/ranged GET,
    prefix listing with ``start_after``, no rename, no directories
    ("is_dir" = some key has the prefix — exactly what an S3 client
    fakes). The backing directory is an implementation detail — it
    makes the store multiprocess-visible (executor tasks see the same
    objects) and lets Spark's data plane scan the same bytes via
    :meth:`spark_path`, mirroring s3a over the same bucket.

    ``scheme://`` paths map as ``scheme://a/b`` → ``backing/a/b``.
    Injection: ``latency_s`` sleeps per API call (object-store RTT);
    ``fail_substr`` raises :class:`FakeObjectStoreError` on any call
    whose path contains it. ``counters`` tallies per-verb API calls
    driver-side (executor copies tally into their own forked copy —
    pin driver-side behavior with them, e.g. the listing cursor).
    """

    def __init__(
        self,
        scheme: str,
        backing_dir: str,
        latency_s: float = 0.0,
        fail_substr: str | None = None,
    ):
        self.scheme = scheme
        self.backing = os.path.abspath(backing_dir)
        self.latency_s = latency_s
        self.fail_substr = fail_substr
        self.counters: dict[str, int] = {}
        self._lock = threading.Lock()

    def __getstate__(self):
        d = self.__dict__.copy()
        del d["_lock"]
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._lock = threading.Lock()

    def _hit(self, verb: str, path: str) -> None:
        if self.latency_s:
            time.sleep(self.latency_s)
        with self._lock:
            self.counters[verb] = self.counters.get(verb, 0) + 1
        if self.fail_substr and self.fail_substr in path:
            raise FakeObjectStoreError(
                f"injected object-store failure: {verb} {path}"
            )

    def _resolve(self, path: str) -> str:
        pre = self.scheme + "://"
        if not path.startswith(pre):
            raise ValueError(
                f"{path!r} is not a {pre} path — this store only "
                "serves its own scheme"
            )
        key = path[len(pre):].strip("/")
        return os.path.join(self.backing, key) if key else self.backing

    # -- writes (object semantics: puts are atomic per object, no
    # rename — move is server-side copy + delete, like S3 CopyObject;
    # put_if_absent models S3's conditional PUT, If-None-Match: *) ----
    def put_bytes(self, path: str, data: bytes) -> None:
        self._hit("put", path)
        full = self._resolve(path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        tmp = full + f".put-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, full)  # single-object PUT: old bytes or new

    def put_if_absent(self, path: str, data: bytes) -> None:
        self._hit("put_if_absent", path)
        full = self._resolve(path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        tmp = full + f".cas-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, full)  # atomic create-if-absent on backing
        except FileExistsError:
            raise FileExistsError(path) from None
        finally:
            os.unlink(tmp)

    def delete(self, path, missing_ok=True):
        self._hit("delete", path)
        try:
            os.unlink(self._resolve(path))
        except FileNotFoundError:
            if not missing_ok:
                raise FileNotFoundError(path) from None

    def delete_prefix(self, path):
        # one recursive listing + batched deletes in a real store
        self._hit("delete_prefix", path)
        import shutil

        shutil.rmtree(self._resolve(path), ignore_errors=True)

    def makedirs(self, path):
        pass  # no directories: keys imply their prefixes

    def move_file(self, src, dst):
        # server-side CopyObject + DeleteObject — never a rename
        self.copy_file(src, dst)
        self.delete(src)

    def copy_file(self, src, dst):
        # server-side CopyObject: no byte transfer through the client
        self._hit("copy_object", dst)
        s, d = self._resolve(src), self._resolve(dst)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        try:
            os.link(s, d)  # objects are immutable once put
        except FileExistsError:
            os.unlink(d)
            os.link(s, d)
        except OSError:
            import shutil

            shutil.copyfile(s, d)

    def walk_files(self, path):
        self._hit("list", path)  # one recursive ListObjects
        full = self._resolve(path)
        out = []
        for dirpath, _dirs, files in os.walk(full):
            for fn in files:
                out.append(
                    os.path.relpath(os.path.join(dirpath, fn), full)
                )
        return sorted(out)

    def remove_empty_dirs(self, path):
        # the STORE has no directories; the backing dir does — prune
        # them so spark_path scans don't see ghost hive dirs
        full = self._resolve(path)
        for dirpath, _dirs, files in os.walk(full, topdown=False):
            if dirpath != full and not os.listdir(dirpath):
                os.rmdir(dirpath)

    # -- FileIO ---------------------------------------------------------
    def list_dir(self, path, start_after=None):
        self._hit("list", path)
        full = self._resolve(path)
        # object stores have no directories: empty "dir" == no keys
        if not os.path.isdir(full):
            return []
        names = sorted(os.listdir(full))
        if start_after is not None:
            names = [n for n in names if n > start_after]
        return names

    def read_bytes(self, path):
        self._hit("get", path)
        full = self._resolve(path)
        try:
            with open(full, "rb") as f:
                return f.read()
        except IsADirectoryError:
            raise FileNotFoundError(path) from None

    def read_range(self, path, offset, length):
        self._hit("get_range", path)
        full = self._resolve(path)
        with open(full, "rb") as f:
            f.seek(offset)
            return f.read(length)

    def exists(self, path):
        self._hit("head", path)
        full = self._resolve(path)
        return os.path.exists(full)

    def mtime(self, path):
        self._hit("head", path)
        return os.path.getmtime(self._resolve(path))

    def is_dir(self, path):
        self._hit("list", path)
        return os.path.isdir(self._resolve(path))

    def size(self, path):
        self._hit("head", path)
        return os.path.getsize(self._resolve(path))

    def spark_path(self, path):
        return self._resolve(path)

    def file_uri(self, path):
        return "file:" + self._resolve(path)


_LOCAL = LocalFileIO()
_REGISTRY: dict[str, FileIO] = {}


def register_fileio(scheme: str, io: FileIO) -> None:
    """Driver-local scheme registration (tests, deployments)."""
    _REGISTRY[scheme] = io


def unregister_fileio(scheme: str) -> None:
    _REGISTRY.pop(scheme, None)


def norm_path(path: str) -> str:
    """``os.path.normpath`` that survives URI schemes —
    ``normpath('fake://a//b')`` would collapse the scheme separator
    to ``fake:/a/b`` and break every registry lookup downstream.
    Normalize only the part after ``scheme://``."""
    if "://" in path:
        scheme, rest = path.split("://", 1)
        return scheme + "://" + os.path.normpath(rest)
    return os.path.normpath(path)


def io_for(path: str) -> FileIO:
    """Resolve the FileIO serving ``path`` by URI scheme. Plain paths
    and ``file:`` URIs are POSIX; anything else must have been
    registered (or passed explicitly as ``io=``) — unknown schemes
    fail with guidance instead of mangling the path through ``os``."""
    if "://" in path:
        scheme = path.split("://", 1)[0]
        if scheme in _REGISTRY:
            return _REGISTRY[scheme]
        if scheme == "file":
            return _LOCAL
        raise ValueError(
            f"no FileIO registered for scheme {scheme!r} "
            f"({path}) — register_fileio() or pass io= explicitly"
        )
    return _REGISTRY.get("", _LOCAL)


def encode_fileio(io: FileIO) -> str:
    """Serialize a FileIO for transport through string-only channels
    (DataSource options: the Python DataSource API constructs sources
    in WORKER processes, where the driver's scheme registry does not
    exist). pickle+base64 — every FileIO here is picklable by design."""
    import base64
    import pickle

    return base64.b64encode(pickle.dumps(io)).decode("ascii")


def decode_fileio(s: str) -> FileIO:
    import base64
    import pickle

    return pickle.loads(base64.b64decode(s.encode("ascii")))


class HadoopFileIO(FileIO):
    """Metadata reads through the JVM's Hadoop FileSystem layer — the
    DEPLOYMENT adapter: any URI the Spark runtime can scan (s3a://,
    gs://, abfss://, hdfs://, file://) serves metadata through the
    same connectors and credentials the data plane already uses, so an
    object-store-resident lakehouse table reads with ZERO extra
    configuration.

    DRIVER-ONLY by construction (``executor_safe = False``): the py4j
    gateway does not exist in executor Python workers, so this object
    refuses to pickle with a pointed error. Readers honor the flag —
    deletion-vector and manifest decodes that normally run executor-
    side fall back to a driver-side decode (bounded by descriptor
    count; for executor-side decode at scale, provide a picklable
    SDK-backed FileIO instead — boto3/gcsfs shaped like
    FakeObjectStore). The streaming sources require a picklable
    FileIO for the same reason.
    """

    executor_safe = False

    def __init__(self, spark):
        self._spark = spark

    def __getstate__(self):
        raise TypeError(
            "HadoopFileIO is driver-only (py4j gateway) — executor-"
            "side metadata decode needs a picklable FileIO (e.g. an "
            "SDK-backed store shaped like FakeObjectStore)"
        )

    # -- jvm plumbing ---------------------------------------------------
    def _jvm(self):
        return self._spark._jvm

    def _jpath(self, path: str):
        return self._jvm().org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        jvm = self._jvm()
        uri = self._jpath(path).toUri()
        conf = self._spark._jsc.hadoopConfiguration()
        return jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)

    # -- FileIO ----------------------------------------------------------
    def list_dir(self, path, start_after=None):
        """NOTE: Hadoop's listStatus has no server-side StartAfter —
        this lists the WHOLE directory and filters client-side, so
        the streaming sources' O(new-commits)-per-trigger cursor
        degrades to O(log size) per trigger on this adapter. Size
        hot-log retention accordingly (cleanup_delta_log
        keep_commits), or serve streaming through an object-SDK
        FileIO whose listing is a true key-range scan
        (FakeObjectStore models one; PyArrowFileIO on S3 is one)."""
        fs = self._fs(path)
        p = self._jpath(path)
        if not fs.exists(p):
            raise FileNotFoundError(path)
        names = sorted(
            st.getPath().getName() for st in fs.listStatus(p)
        )
        if start_after is not None:
            names = [n for n in names if n > start_after]
        return names

    # -- writes (through the same JVM connectors/credentials as the
    # data plane) -------------------------------------------------------
    def put_bytes(self, path, data):
        stream = self._fs(path).create(self._jpath(path), True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def put_if_absent(self, path, data):
        """create(overwrite=false) — ATOMIC on HDFS/ABFS/local; on
        s3a it is a client-side exists-then-write (no conditional PUT
        through Hadoop), so racing commit writers on raw s3a need the
        coordinator LogStore instead — the same honest boundary
        txnlog.LocalLogStore documents."""
        fs = self._fs(path)
        p = self._jpath(path)
        try:
            stream = fs.create(p, False)
        except Exception as e:  # noqa: BLE001 — py4j wraps the java IOE
            je = getattr(e, "java_exception", None)
            cls = je.getClass().getName() if je is not None else ""
            # lost race iff the java class says so, or the target
            # verifiably exists — never on wording alone (an ABFS
            # lease error's message also contains "exists")
            if (
                "AlreadyExists" in cls
                or "AlreadyBeingCreated" in cls
                or ("exists" in str(e).lower() and fs.exists(p))
            ):
                raise FileExistsError(path) from None
            raise
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def delete(self, path, missing_ok=True):
        existed = bool(
            self._fs(path).delete(self._jpath(path), False)
        )
        if not existed and not missing_ok:
            raise FileNotFoundError(path)

    def delete_prefix(self, path):
        self._fs(path).delete(self._jpath(path), True)

    def makedirs(self, path):
        self._fs(path).mkdirs(self._jpath(path))

    def move_file(self, src, dst):
        fs = self._fs(dst)
        dp = self._jpath(dst)
        parent = dp.getParent()
        if parent is not None:
            fs.mkdirs(parent)
        if not fs.rename(self._jpath(src), dp):
            raise OSError(f"rename failed: {src} -> {dst}")

    def walk_files(self, path):
        fs = self._fs(path)
        p = self._jpath(path)
        if not fs.exists(p):
            return []
        base = p.toUri().getPath()
        out = []
        it = fs.listFiles(p, True)
        while it.hasNext():
            fp = it.next().getPath().toUri().getPath()
            out.append(os.path.relpath(fp, base))
        return sorted(out)

    def remove_empty_dirs(self, path):
        fs = self._fs(path)

        def _prune(jp) -> bool:  # returns "now empty"
            st = fs.listStatus(jp)
            empty = True
            for s in st:
                if s.isDirectory() and _prune(s.getPath()):
                    fs.delete(s.getPath(), False)
                else:
                    empty = False
            return empty

        p = self._jpath(path)
        if fs.exists(p):
            _prune(p)

    def read_bytes(self, path):
        fs = self._fs(path)
        p = self._jpath(path)
        if not fs.exists(p):
            raise FileNotFoundError(path)
        stream = fs.open(p)
        try:
            data = self._jvm().org.apache.commons.io.IOUtils.toByteArray(
                stream
            )
        finally:
            stream.close()
        return bytes(data)

    def read_range(self, path, offset, length):
        fs = self._fs(path)
        p = self._jpath(path)
        if not fs.exists(p):
            raise FileNotFoundError(path)
        size = fs.getFileStatus(p).getLen()
        n = max(0, min(int(length), int(size) - int(offset)))
        if n == 0:
            return b""
        stream = fs.open(p)
        try:
            stream.seek(int(offset))
            data = self._jvm().org.apache.commons.io.IOUtils.toByteArray(
                stream, n
            )
        finally:
            stream.close()
        return bytes(data)

    def exists(self, path):
        return bool(self._fs(path).exists(self._jpath(path)))

    def mtime(self, path):
        return (
            self._fs(path)
            .getFileStatus(self._jpath(path))
            .getModificationTime()
            / 1000.0
        )

    def is_dir(self, path):
        fs = self._fs(path)
        p = self._jpath(path)
        return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())

    def size(self, path):
        return int(self._fs(path).getFileStatus(self._jpath(path)).getLen())

    def spark_path(self, path):
        return path  # the data plane already speaks Hadoop URIs


class PyArrowFileIO(FileIO):
    """FileIO over a ``pyarrow.fs.FileSystem`` — the PICKLABLE
    deployment adapter for real remote schemes (HadoopFileIO's
    documented gap): Arrow filesystems serialize, so executor-side
    DV/manifest/footer decodes run distributed against s3://, gs://,
    hdfs:// — no py4j gateway, no driver fallback, no new dependency
    (pyarrow ships with Spark's Arrow integration).

    Path mapping mirrors :class:`FakeObjectStore`'s ergonomics:
    ``scheme``/``base`` map table-space paths ``scheme://k`` to the
    filesystem-native path ``base/k`` (S3FileSystem speaks
    ``bucket/key``, LocalFileSystem a POSIX dir); ``scheme=None``
    passes paths through verbatim. ``spark_scheme`` names the URI
    scheme the JVM data plane should scan (``s3://…`` → ``s3a://…``);
    when unset, ``spark_path`` returns the filesystem-native path —
    right for LocalFileSystem, where that path IS scannable.

    HONEST BOUNDARY — ``put_if_absent``: pyarrow.fs has no
    conditional create, so the COMMIT-POINT verb works only where the
    filesystem itself can provide one (LocalFileSystem → the POSIX
    link-CAS). Remote schemes raise with guidance: commit through a
    coordinator (:class:`..logstores.SqliteCoordinatedLogStore`) or
    an SDK-backed FileIO with a real conditional PUT; every other
    read/write verb works everywhere.
    """

    executor_safe = True

    def __init__(
        self,
        fs=None,
        scheme: str | None = None,
        base: str = "",
        spark_scheme: str | None = None,
    ):
        if fs is None:
            from pyarrow.fs import LocalFileSystem

            fs = LocalFileSystem()
        self.fs = fs
        self.scheme = scheme
        self.base = base.rstrip("/")
        self.spark_scheme = spark_scheme

    def _key(self, path: str) -> str:
        if self.scheme is None:
            return path
        pre = self.scheme + "://"
        if not path.startswith(pre):
            raise ValueError(
                f"{path!r} is not a {pre} path — this FileIO only "
                "serves its own scheme"
            )
        key = path[len(pre):].strip("/")
        if not self.base:
            return key
        return f"{self.base}/{key}" if key else self.base

    def _info(self, path: str):
        return self.fs.get_file_info(self._key(path))

    # -- reads ----------------------------------------------------------
    def list_dir(self, path, start_after=None):
        from pyarrow.fs import FileSelector, FileType

        p = self._key(path)
        infos = self.fs.get_file_info(
            FileSelector(p, recursive=False, allow_not_found=True)
        )
        if not infos and self.fs.get_file_info(p).type == FileType.NotFound:
            raise FileNotFoundError(path)
        names = sorted(i.base_name for i in infos)
        if start_after is not None:
            names = [n for n in names if n > start_after]
        return names

    def read_bytes(self, path):
        with self.fs.open_input_stream(self._key(path)) as f:
            return f.read()

    def read_range(self, path, offset, length):
        with self.fs.open_input_file(self._key(path)) as f:
            f.seek(offset)
            return f.read(length)

    def exists(self, path):
        from pyarrow.fs import FileType

        return self._info(path).type != FileType.NotFound

    def mtime(self, path):
        info = self._info(path)
        if info.mtime_ns is not None:
            return info.mtime_ns / 1e9
        raise OSError(f"{path}: filesystem records no mtime")

    def is_dir(self, path):
        from pyarrow.fs import FileType

        return self._info(path).type == FileType.Directory

    def size(self, path):
        info = self._info(path)
        if info.size is None:
            raise FileNotFoundError(path)
        return int(info.size)

    # -- writes ---------------------------------------------------------
    def put_bytes(self, path, data):
        p = self._key(path)
        parent = p.rsplit("/", 1)[0] if "/" in p else ""
        if parent:
            self.fs.create_dir(parent, recursive=True)
        with self.fs.open_output_stream(p) as f:
            f.write(data)

    def put_atomic(self, path, data):
        # open_output_stream truncates IN PLACE — a concurrent reader
        # of a version hint / checkpoint would see a torn write. Land
        # the bytes complete under a tmp name, then move (rename on
        # filesystems; on object stores the final copy is one atomic
        # object put either way).
        import uuid as _uuid

        p = self._key(path)
        parent = p.rsplit("/", 1)[0] if "/" in p else ""
        if parent:
            self.fs.create_dir(parent, recursive=True)
        tmp = p + f".tmp-{_uuid.uuid4().hex}"
        with self.fs.open_output_stream(tmp) as f:
            f.write(data)
        self.fs.move(tmp, p)

    def put_if_absent(self, path, data):
        from pyarrow.fs import LocalFileSystem

        if isinstance(self.fs, LocalFileSystem):
            return LocalFileIO().put_if_absent(self._key(path), data)
        raise NotImplementedError(
            "pyarrow.fs exposes no conditional PUT — commit through "
            "a coordinator LogStore (logstores."
            "SqliteCoordinatedLogStore) or an SDK-backed FileIO with "
            "a real If-None-Match put; PyArrowFileIO serves every "
            "other verb"
        )

    def delete(self, path, missing_ok=True):
        try:
            self.fs.delete_file(self._key(path))
        except FileNotFoundError:
            if not missing_ok:
                raise FileNotFoundError(path) from None

    def delete_prefix(self, path):
        try:
            self.fs.delete_dir(self._key(path))
        except FileNotFoundError:
            pass

    def makedirs(self, path):
        self.fs.create_dir(self._key(path), recursive=True)

    def move_file(self, src, dst):
        # Arrow's move: rename where the fs has one, copy+delete on
        # object stores — the same promotion contract as ever
        d = self._key(dst)
        parent = d.rsplit("/", 1)[0] if "/" in d else ""
        if parent:
            self.fs.create_dir(parent, recursive=True)
        self.fs.move(self._key(src), d)

    def walk_files(self, path):
        from pyarrow.fs import FileSelector, FileType

        p = self._key(path)
        infos = self.fs.get_file_info(
            FileSelector(p, recursive=True, allow_not_found=True)
        )
        base = p.rstrip("/") + "/"
        return sorted(
            i.path[len(base):]
            for i in infos
            if i.type == FileType.File and i.path.startswith(base)
        )

    def remove_empty_dirs(self, path):
        from pyarrow.fs import FileSelector, FileType

        p = self._key(path)
        infos = self.fs.get_file_info(
            FileSelector(p, recursive=True, allow_not_found=True)
        )
        files = [i.path for i in infos if i.type != FileType.Directory]
        dirs = sorted(
            (i.path for i in infos if i.type == FileType.Directory),
            key=len,
            reverse=True,  # deepest first
        )
        empty: set = set()
        for d in dirs:
            pre = d.rstrip("/") + "/"
            if not any(f.startswith(pre) for f in files) and not any(
                o.startswith(pre) and o not in empty for o in dirs
            ):
                self.fs.delete_dir(d)
                empty.add(d)

    # -- plane translation ----------------------------------------------
    def spark_path(self, path):
        if self.scheme is None:
            return path
        if self.spark_scheme is not None:
            pre = self.scheme + "://"
            return self.spark_scheme + "://" + path[len(pre):]
        return self._key(path)  # fs-native (LocalFileSystem: POSIX)

    def file_uri(self, path):
        p = self.spark_path(path)
        if "://" not in p:
            return "file:" + os.path.abspath(p)
        return super().file_uri(path)

    def parquet_source(self, path):
        # Arrow's own ranged reader — footer sniffs never buffer the
        # whole object
        return self.fs.open_input_file(self._key(path))


class _RangeFile:
    """Minimal seekable file-like over FileIO.read_range (what
    pyarrow.PythonFile needs for footer-only parquet reads)."""

    def __init__(self, io: FileIO, path: str):
        self._io = io
        self._path = path
        self._pos = 0
        self._size = io.size(path)

    def size(self):
        return self._size

    def tell(self):
        return self._pos

    def seek(self, offset, whence=0):
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            self._pos = self._size + offset
        return self._pos

    def read(self, n=-1):
        if n is None or n < 0:
            n = self._size - self._pos
        data = self._io.read_range(self._path, self._pos, n)
        self._pos += len(data)
        return data

    def readable(self):
        return True

    def seekable(self):
        return True

    def writable(self):
        return False

    def close(self):
        pass

    @property
    def closed(self):
        return False
