"""Source discovery / classification / filtering (SURVEY §2 A1-A4, A20).

Reproduces the reference scanner's contract
(`src/scanners/file_scanner.py:80-221`): recursive glob, extension
classification, include/exclude fnmatch filters, default ignore list,
readability probe, and per-file metadata.

This stage is driver-side by design: at 100 TB the file *listing* is
still metadata-scale (Spark itself lists distributively via
InMemoryFileIndex once paths are handed to the reader; for object
stores you'd pass prefixes, not expanded lists). The scanner's job is
policy — which files participate — not data movement.
"""

from __future__ import annotations

import fnmatch
import hashlib
import os
from dataclasses import dataclass, field
from pathlib import Path

# extension → format family (reference `file_scanner.py:15-30`; orc/xml
# are engine extensions — both are built-in Spark data sources)
EXTENSION_MAP = {
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".tsv": "csv",
    ".psv": "csv",
    ".parquet": "parquet",
    ".pq": "parquet",
    ".pqt": "parquet",
    ".orc": "orc",
    ".xml": "xml",
}

# default ignore patterns (reference `file_scanner.py:33-44`)
DEFAULT_IGNORE_PATTERNS = [
    ".*",          # hidden files
    "*.tmp",
    "*.temp",
    "*~",
    "__pycache__",
    ".git*",
    ".DS_Store",
    "Thumbs.db",
]

MD5_SIZE_LIMIT = 10 * 1024 * 1024  # hash only files <10 MB (reference policy)


@dataclass
class ScanStats:
    files_seen: int = 0
    files_classified: int = 0
    files_ignored: int = 0
    by_type: dict[str, int] = field(default_factory=dict)


class FileScanner:
    """Recursive discovery with classification and pattern filtering."""

    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.stats = ScanStats()

    def classify_file(self, path: Path) -> str | None:
        """Extension → format family; a trailing ``.gz`` is transparent
        for the TEXT formats (``x.jsonl.gz`` → json — Spark's readers
        decompress by codec extension). Columnar formats compress
        internally, so ``.parquet.gz``/``.orc.gz`` stay unclassified."""
        suffix = path.suffix.lower()
        if suffix == ".gz":
            inner = EXTENSION_MAP.get(Path(path.stem).suffix.lower())
            return inner if inner in ("json", "csv", "xml") else None
        return EXTENSION_MAP.get(suffix)

    def _should_ignore(self, path: Path) -> bool:
        name = path.name
        return any(fnmatch.fnmatch(name, pat) for pat in DEFAULT_IGNORE_PATTERNS)

    def _matches(self, path: Path, include: list[str] | None, exclude: list[str] | None) -> bool:
        name = path.name
        if include and not any(fnmatch.fnmatch(name, p) for p in include):
            return False
        if exclude and any(fnmatch.fnmatch(name, p) for p in exclude):
            return False
        return True

    def discover_files(
        self,
        file_types: list[str] | None = None,
        recursive: bool = True,
        include_patterns: list[str] | None = None,
        exclude_patterns: list[str] | None = None,
    ) -> dict[str, list[Path]]:
        """Glob → classify → filter, grouped by format family."""
        out: dict[str, list[Path]] = {}
        pattern = "**/*" if recursive else "*"
        for p in sorted(self.root.glob(pattern)):
            if not p.is_file():
                continue
            self.stats.files_seen += 1
            if self._should_ignore(p) or not self._matches(p, include_patterns, exclude_patterns):
                self.stats.files_ignored += 1
                continue
            ftype = self.classify_file(p)
            if ftype is None or (file_types and ftype not in file_types):
                self.stats.files_ignored += 1
                continue
            out.setdefault(ftype, []).append(p)
            self.stats.files_classified += 1
            self.stats.by_type[ftype] = self.stats.by_type.get(ftype, 0) + 1
        return out

    def validate_discovered_files(
        self, discovered: dict[str, list[Path]]
    ) -> dict[str, list[Path]]:
        """Readability probe (read 1 byte) — drops unreadable files, the
        driver-side analogue of ``ignoreCorruptFiles``."""
        valid: dict[str, list[Path]] = {}
        for ftype, paths in discovered.items():
            for p in paths:
                try:
                    with open(p, "rb") as f:
                        f.read(1)
                    valid.setdefault(ftype, []).append(p)
                except OSError:
                    self.stats.files_ignored += 1
        return valid

    def get_file_details(self, path: Path) -> dict:
        """A20 metadata: sizes, times, readability, md5 for small files."""
        st = path.stat()
        details = {
            "path": str(path),
            "name": path.name,
            "stem": path.stem,
            "suffix": path.suffix,
            "size_bytes": st.st_size,
            "modified_time": st.st_mtime,
            "is_readable": os.access(path, os.R_OK),
            "detected_type": self.classify_file(path),
        }
        if st.st_size < MD5_SIZE_LIMIT:
            h = hashlib.md5()
            with open(path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            details["md5"] = h.hexdigest()
        return details

    def get_scan_statistics(self) -> ScanStats:
        return self.stats
