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
