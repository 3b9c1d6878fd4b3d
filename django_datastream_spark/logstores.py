"""Non-POSIX LogStore implementations (the seam's deployment story).

:class:`LocalLogStore` (txnlog.py) relies on POSIX create-exclusive
(``os.link``) for its commit CAS — available on local FS / HDFS /
ABFS, but NOT on S3-without-conditional-PUT, where a plain PUT is
last-writer-wins and two racing writers of ``v000…42.json`` would
silently lose a commit. The documented recipe (txnlog.py LogStore
docstring) is an external coordinator holding the name→winner mapping
— Delta's S3DynamoDBLogStore. :class:`SqliteCoordinatedLogStore`
implements that recipe with honest object-store semantics:

- canonical objects are written with plain single-object puts
  (atomic per object, like an S3 PUT — but NOT conditional);
- mutual exclusion comes ONLY from the coordinator: a UNIQUE-key
  insert into a shared SQLite database (stdlib, multi-process safe)
  standing in for DynamoDB's conditional put. The insert is the
  commit point; losing it maps to ``FileExistsError`` exactly like
  LocalLogStore's lost ``os.link``;
- the write protocol is *stage → claim → publish*: content is staged
  COMPLETE under a unique name before the claim, so a writer that
  crashes between claim and publish (the classic crash window) left
  enough behind for ANY reader to finish the job — ``read``/``list``
  recover claimed-but-unpublished entries from the staged object and
  re-publish them (the S3DynamoDBLogStore "fix-up on read" rule);
- each claim carries a fencing token (the writer's uuid): only the
  token holder publishes the canonical object, so a zombie process
  resuming after its claim was recovered by someone else cannot tear
  the published content.

Failure injection (``fail_after_stage`` / ``fail_after_claim``) makes
the crash windows testable — tests/test_logstore_mp.py drives commit
races from separate OS processes through both stores and proves the
same conflict/conservation invariants hold.
"""

from __future__ import annotations

import os
import sqlite3
import uuid

from .txnlog import LogStore


class ChaosError(RuntimeError):
    """Injected crash (failure-injection hooks only)."""


class FileIOLogStore(LogStore):
    """A LogStore over a :class:`..sources.fileio.FileIO` — the round-
    11 unification: commit points and data/sidecar writes share ONE
    storage object. The FileIO's ``put_if_absent`` must be a true
    conditional PUT (S3 If-None-Match, POSIX link-CAS, the fake
    store's create-exclusive); a store without one needs
    :class:`SqliteCoordinatedLogStore` instead — same rule as ever."""

    def __init__(self, io):
        self.io = io

    def list(self, dirpath: str) -> list[str]:
        try:
            return self.io.list_dir(dirpath)
        except FileNotFoundError:
            return []

    def read(self, path: str) -> bytes:
        return self.io.read_bytes(path)

    def put_if_absent(self, path: str, data: bytes) -> None:
        self.io.put_if_absent(path, data)

    def put_atomic(self, path: str, data: bytes) -> None:
        self.io.put_atomic(path, data)


def log_store_for(io) -> LogStore:
    """The LogStore a write path should commit through for a root
    served by ``io``: POSIX roots keep the PROCESS-GLOBAL store
    (``txnlog.get_log_store()`` — deployments swap it for the
    coordinator store, and that override must keep governing local
    tables); any other FileIO commits through itself."""
    from .sources.fileio import LocalFileIO
    from .txnlog import get_log_store

    if type(io) is LocalFileIO:
        return get_log_store()
    return FileIOLogStore(io)


class SqliteCoordinatedLogStore(LogStore):
    """Coordinator-backed store: object-store puts + SQLite CAS.

    ``db_path`` is the shared coordinator database (one per
    deployment, like one DynamoDB table); objects live on the plain
    filesystem standing in for the bucket. Connections are opened per
    operation so the store is trivially fork/spawn-safe.
    """

    def __init__(
        self,
        db_path: str,
        *,
        fail_after_stage: bool = False,
        fail_after_claim: bool = False,
    ):
        self.db_path = db_path
        self.fail_after_stage = fail_after_stage
        self.fail_after_claim = fail_after_claim
        self.token = uuid.uuid4().hex
        with self._db() as con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS claims ("
                " path TEXT PRIMARY KEY,"
                " staged TEXT NOT NULL,"
                " token TEXT NOT NULL,"
                " published INTEGER NOT NULL DEFAULT 0)"
            )

    def _db(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.db_path, timeout=30.0)
        con.execute("PRAGMA busy_timeout = 30000")
        return con

    # -- plain single-object puts (atomic per object, like S3 PUT) ----
    @staticmethod
    def _put_object(path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".put-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    # -- LogStore interface -------------------------------------------
    def put_if_absent(self, path: str, data: bytes) -> None:
        # A canonical object with NO claim row predates this
        # coordinator database (a table first written via
        # LocalLogStore, or a recreated DB) — the claim insert would
        # succeed and publish would OVERWRITE a committed version
        # (a silently lost commit). Fail closed instead: between
        # writers sharing ONE coordinator DB the claim alone decides,
        # so this check only ever fires on out-of-band objects.
        # Deployment rule (documented): a coordinator DB must live as
        # long as the objects it guards.
        with self._db() as con:
            claimed = con.execute(
                "SELECT 1 FROM claims WHERE path = ?", (path,)
            ).fetchone()
        if claimed is None and os.path.exists(path):
            raise FileExistsError(path)
        staged = f"{path}.staged-{uuid.uuid4().hex}"
        self._put_object(staged, data)  # COMPLETE before the claim
        if self.fail_after_stage:
            raise ChaosError(f"injected crash after stage: {staged}")
        try:
            with self._db() as con:
                con.execute(
                    "INSERT INTO claims (path, staged, token)"
                    " VALUES (?, ?, ?)",
                    (path, staged, self.token),
                )
        except sqlite3.IntegrityError:
            try:
                os.unlink(staged)
            except OSError:
                pass
            raise FileExistsError(path) from None
        if self.fail_after_claim:
            raise ChaosError(f"injected crash after claim: {path}")
        self._publish(path, staged, self.token)

    def _publish(self, path: str, staged: str, token: str) -> None:
        """Copy the staged object to the canonical name and mark the
        claim published — idempotent, fenced by ``token``: only the
        current claim holder's content ever lands on the name."""
        with self._db() as con:
            row = con.execute(
                "SELECT staged, token, published FROM claims"
                " WHERE path = ?",
                (path,),
            ).fetchone()
            if row is None or row[1] != token:
                return  # fenced out: someone recovered/replaced us
            if not row[2]:
                with open(staged, "rb") as f:
                    self._put_object(path, f.read())
                con.execute(
                    "UPDATE claims SET published = 1"
                    " WHERE path = ? AND token = ?",
                    (path, token),
                )

    def _recover(self, path: str) -> bool:
        """Fix-up-on-read: publish a claimed-but-unpublished entry
        from its staged object. Returns True when ``path`` is (now)
        readable canonically."""
        with self._db() as con:
            row = con.execute(
                "SELECT staged, token, published FROM claims"
                " WHERE path = ?",
                (path,),
            ).fetchone()
        if row is None:
            return False
        if not row[2]:
            self._publish(path, row[0], row[1])
        return os.path.exists(path)

    def list(self, dirpath: str) -> list[str]:
        try:
            names = {
                n for n in os.listdir(dirpath)
                if ".staged-" not in n and ".put-" not in n
            }
        except FileNotFoundError:
            names = set()
        # claimed names whose publish hasn't landed yet must still be
        # visible (their content is complete by protocol) — recover
        prefix = os.path.join(dirpath, "")
        with self._db() as con:
            rows = con.execute(
                "SELECT path FROM claims WHERE published = 0"
                " AND path LIKE ?",
                (prefix + "%",),
            ).fetchall()
        for (p,) in rows:
            if os.path.dirname(p) == dirpath.rstrip(os.sep):
                if self._recover(p):
                    names.add(os.path.basename(p))
        return sorted(names)

    def read(self, path: str) -> bytes:
        if not os.path.exists(path) and not self._recover(path):
            raise FileNotFoundError(path)
        with open(path, "rb") as f:
            return f.read()

    def put_atomic(self, path: str, data: bytes) -> None:
        # derived idempotent artifacts: last-writer-wins is correct,
        # a plain object put suffices (no coordination)
        self._put_object(path, data)
