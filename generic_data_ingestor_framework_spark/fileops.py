"""Driver-side file operations (SURVEY §2 A27).

The reference's ``FileHandler`` copy/move/delete with validation and an
operation history (`src/handlers/file_handler.py:268-351`). Not engine
operators — staging utilities. On a cluster these would go through the
Hadoop FileSystem API against the object store; the local
implementation keeps the same contract (validate → act → record).
"""

from __future__ import annotations

import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class FileOps:
    history: list[dict] = field(default_factory=list)

    def _record(self, op: str, src: str, dst: str | None, ok: bool, err: str = ""):
        self.history.append(
            {"op": op, "src": src, "dst": dst, "ok": ok, "error": err, "ts": time.time()}
        )

    def copy_file(self, src: str | Path, dst: str | Path, overwrite: bool = False) -> bool:
        src, dst = Path(src), Path(dst)
        try:
            if not src.is_file():
                raise FileNotFoundError(src)
            if dst.exists() and not overwrite:
                raise FileExistsError(dst)
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst)
            self._record("copy", str(src), str(dst), True)
            return True
        except OSError as ex:
            self._record("copy", str(src), str(dst), False, str(ex))
            return False

    def move_file(self, src: str | Path, dst: str | Path, overwrite: bool = False) -> bool:
        src, dst = Path(src), Path(dst)
        try:
            if not src.is_file():
                raise FileNotFoundError(src)
            if dst.exists() and not overwrite:
                raise FileExistsError(dst)
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(src), str(dst))
            self._record("move", str(src), str(dst), True)
            return True
        except OSError as ex:
            self._record("move", str(src), str(dst), False, str(ex))
            return False

    def delete_file(self, path: str | Path) -> bool:
        path = Path(path)
        try:
            if not path.is_file():
                raise FileNotFoundError(path)
            path.unlink()
            self._record("delete", str(path), None, True)
            return True
        except OSError as ex:
            self._record("delete", str(path), None, False, str(ex))
            return False

    def get_operation_history(self) -> list[dict]:
        return list(self.history)


# ---------------------------------------------------------------------------
# Storage-agnostic helpers shared by the cross-run index machinery
# (llm/dedup.py band index, llm/similarity.py ANN index) — Hadoop
# FileSystem API so the same code addresses local disk in tests and an
# object store at cluster scale.
# ---------------------------------------------------------------------------


def sf_tag(sf_dir: str) -> str:
    """A filesystem/table-name-safe tag for a data directory."""
    return "".join(ch if ch.isalnum() else "_" for ch in sf_dir).strip("_")


def hadoop_fs_path(spark, path: str):
    """(FileSystem, Path) for any Hadoop-addressable location."""
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def hadoop_exists(spark, path: str) -> bool:
    fs, p = hadoop_fs_path(spark, path)
    return bool(fs.exists(p))


def hadoop_delete(spark, path: str) -> None:
    fs, p = hadoop_fs_path(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def hadoop_list_dirs(spark, path: str) -> list[str]:
    """Immediate subdirectory paths of ``path`` (empty if absent)."""
    fs, p = hadoop_fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [
        st.getPath().toString() for st in fs.listStatus(p) if st.isDirectory()
    ]
