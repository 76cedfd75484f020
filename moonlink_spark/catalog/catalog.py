"""File catalog: versioned metadata JSON + version-hint CAS commit.

Re-creates moonlink's FileCatalog commit protocol (reference:
table/iceberg/file_catalog.rs:590-673 — write v{N}.metadata.json, then
conditionally update version-hint.text with an etag compare-and-swap). On a
POSIX filesystem the CAS is `open(path, "x")` on the versioned metadata file
(exclusive create = the conditional PUT) followed by an atomic rename of the
hint. Single-writer discipline per table matches moonlink's per-table event
loop (table_handler.rs event_loop); concurrent committers lose the CAS and
must retry on fresh state.
"""

from __future__ import annotations

import os

from moonlink_spark.catalog.metadata import TableMetadata


class CommitConflict(Exception):
    """Another writer committed this version first (CAS failure)."""


class FileCatalog:
    def __init__(self, table_root: str):
        self.root = os.path.abspath(table_root)
        self.metadata_dir = os.path.join(self.root, "metadata")
        self.data_dir = os.path.join(self.root, "data")

    # -- layout ------------------------------------------------------------
    def ensure_dirs(self) -> None:
        os.makedirs(self.metadata_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    def _hint_path(self) -> str:
        return os.path.join(self.metadata_dir, "version-hint.text")

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.metadata_dir, f"v{version}.metadata.json")

    # -- read --------------------------------------------------------------
    def current_version(self) -> int:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def exists(self) -> bool:
        return self.current_version() > 0

    def load(self, version: int | None = None) -> TableMetadata:
        v = version if version is not None else self.current_version()
        if v <= 0:
            raise FileNotFoundError(f"no committed metadata under {self.root}")
        with open(self._meta_path(v)) as f:
            return TableMetadata.from_json(f.read())

    def load_pinned(self) -> tuple[TableMetadata, int]:
        """Read the version hint FIRST, then load exactly that version.

        Every CAS retry loop must use this (not load() + current_version()
        as two independent reads): a commit landing between the two reads
        would pair NEWER version number with STALE metadata content, so the
        CAS succeeds while silently dropping the intervening commit — a
        parent-snapshot pin can't catch it because it is checked against
        the same stale load."""
        version = self.current_version()
        return self.load(version), version

    def metadata_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.metadata_dir):
            if name.startswith("v") and name.endswith(".metadata.json"):
                out.append(int(name[1 : -len(".metadata.json")]))
        return sorted(out)

    # -- commit (CAS) --------------------------------------------------------
    def commit(self, meta: TableMetadata, expected_version: int) -> int:
        """Commit *meta* as version expected_version+1.

        The exclusive create of v{N+1}.metadata.json is the compare-and-swap:
        if another writer already produced that version, we raise
        CommitConflict (mirrors file_catalog.rs:639-665 etag failure).
        """
        self.ensure_dirs()
        new_version = expected_version + 1
        path = self._meta_path(new_version)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflict(
                f"version {new_version} already committed under {self.root}"
            ) from e
        try:
            with os.fdopen(fd, "w") as f:
                f.write(meta.to_json())
                f.flush()
                os.fsync(f.fileno())
        except Exception:
            os.unlink(path)
            raise
        # atomic hint flip (readers resolve the hint, then the version file)
        tmp = self._hint_path() + f".tmp.{new_version}"
        with open(tmp, "w") as f:
            f.write(str(new_version))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._hint_path())
        return new_version
