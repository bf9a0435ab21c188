"""File backends (disk + optional LMDB).

Counterpart of /root/reference/neosr/data/file_client.py:7-140.  LMDB is
gated: the package isn't in this image, so the backend raises a clear error
unless `lmdb` is importable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any


class HardDiskBackend:
    def get(self, filepath: str | Path, client_key: str | None = None) -> bytes:
        with Path(filepath).open("rb") as f:
            return f.read()


class LmdbBackend:
    def __init__(self, db_paths, client_keys="default", readonly=True, lock=False, readahead=False) -> None:
        try:
            import lmdb
        except ImportError as e:
            msg = "lmdb is not installed in this environment; use the disk backend"
            raise ImportError(msg) from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, (str, Path)):
            db_paths = [str(db_paths)]
        db_paths = [str(v) for v in db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {
            client: lmdb.open(path, readonly=readonly, lock=lock, readahead=readahead)
            for client, path in zip(client_keys, db_paths)
        }

    def get(self, filepath: str, client_key: str) -> bytes:
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            value_buf = txn.get(str(filepath).encode("ascii"))
        return value_buf


class FileClient:
    """Facade dispatching to a backend by name ('disk' or 'lmdb')."""

    _backends = {"disk": HardDiskBackend, "lmdb": LmdbBackend}

    def __init__(self, backend: str = "disk", **kwargs: Any) -> None:
        if backend not in self._backends:
            msg = f"Backend {backend} not supported. Available: {list(self._backends)}"
            raise ValueError(msg)
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath: str | Path, client_key: str = "default") -> bytes:
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)
