"""created_by parsing + legacy-statistics distrust (PARQUET-251).

parquet-mr before 1.8.0 wrote corrupt min/max statistics for binary
columns; every stats-driven prune in the reference is gated on
`CorruptStatistics.shouldIgnoreStatistics` (`parquet-column/src/main/java/
org/apache/parquet/CorruptStatistics.java:58-105`), which parses the
footer's created_by string (`VersionParser.java` format
``<application> version <semver> (build <hash>)``) and distrusts binary
stats from parquet-mr < 1.8.0 — except the CDH backport window
[1.5.0-cdh5.5.0, 1.5.0). Files with missing/unparseable created_by are
also distrusted (PARQUET-297). We apply the same gate before using chunk
Statistics bounds in filtered file reads.
"""

from __future__ import annotations

import re

_CREATED_BY_RE = re.compile(
    r"^(?P<app>.+?)"
    r"(?:\s+version\s+(?P<ver>.+?))?"
    r"(?:\s+\(\s*build\s*(?P<build>.*?)\s*\))?$"
)

_SEMVER_RE = re.compile(
    r"^(?P<major>\d+)\.(?P<minor>\d+)\.(?P<patch>\d+)"
    r"(?P<unknown>[^-+]*)?"
    r"(?:-(?P<pre>[^+]*))?"
    r"(?:\+(?P<build>.*))?$"
)


def parse_created_by(s: str):
    """-> (application, version string | None, build | None), VersionParser
    semantics (application is everything before " version ")."""
    m = _CREATED_BY_RE.match(s.strip())
    if not m:
        raise ValueError(f"unparseable created_by {s!r}")
    return m.group("app"), m.group("ver"), m.group("build")


class SemVer:
    """SemanticVersion.java subset: x.y.z with optional trailing unknown
    part (e.g. ``1.8.0rc4``) and optional ``-prerelease``. Ordering:
    numeric triplet first; a version WITH an unknown part sorts before one
    without; prerelease sorts before release, identifiers compared
    dot-wise (numeric < alphanumeric, numerics numerically)."""

    __slots__ = ("major", "minor", "patch", "unknown", "pre")

    def __init__(self, major, minor, patch, unknown="", pre=None):
        self.major, self.minor, self.patch = major, minor, patch
        self.unknown = unknown or ""
        self.pre = pre

    @classmethod
    def parse(cls, s: str) -> "SemVer":
        m = _SEMVER_RE.match(s.strip())
        if not m:
            raise ValueError(f"unparseable semver {s!r}")
        return cls(
            int(m.group("major")), int(m.group("minor")), int(m.group("patch")),
            m.group("unknown") or "", m.group("pre"),
        )

    @staticmethod
    def _cmp_pre(a: str | None, b: str | None) -> int:
        if a is None and b is None:
            return 0
        if a is None:
            return 1  # release > prerelease
        if b is None:
            return -1
        for x, y in zip(a.split("."), b.split(".")):
            if x == y:
                continue
            if x.isdigit() and y.isdigit():
                return -1 if int(x) < int(y) else 1
            if x.isdigit():
                return -1  # numeric identifiers sort before alphanumeric
            if y.isdigit():
                return 1
            return -1 if x < y else 1
        na, nb = len(a.split(".")), len(b.split("."))
        return (na > nb) - (na < nb)

    def compare(self, other: "SemVer") -> int:
        for a, b in (
            (self.major, other.major),
            (self.minor, other.minor),
            (self.patch, other.patch),
        ):
            if a != b:
                return -1 if a < b else 1
        # unknown part present sorts FIRST (SemanticVersion.compareTo)
        ua, ub = bool(self.unknown), bool(other.unknown)
        if ua != ub:
            return -1 if ua else 1
        return self._cmp_pre(self.pre, other.pre)


_FIXED = SemVer(1, 8, 0)
_CDH_START = SemVer(1, 5, 0, pre="cdh5.5.0")
_CDH_END = SemVer(1, 5, 0)


def should_ignore_statistics(created_by: str | None, ptype: str) -> bool:
    """CorruptStatistics.shouldIgnoreStatistics: True when the chunk's
    min/max must not be trusted. Only BINARY/FLBA stats were affected;
    non-parquet-mr writers are assumed clean; missing or unparseable
    created_by distrusts (PARQUET-297)."""
    if ptype not in ("BYTE_ARRAY", "BINARY", "FIXED_LEN_BYTE_ARRAY"):
        return False
    if not created_by:
        return True
    try:
        app, ver, _ = parse_created_by(created_by)
        if app != "parquet-mr":
            return False
        if not ver:
            return True
        semver = SemVer.parse(ver)
        if semver.compare(_FIXED) < 0 and not (
            semver.compare(_CDH_START) >= 0 and semver.compare(_CDH_END) < 0
        ):
            return True
        return False
    except (ValueError, AttributeError):
        return True


_DELTA_FIXED = SemVer(1, 8, 0)


def requires_sequential_reads(created_by: str | None, encoding: int) -> bool:
    """CorruptDeltaByteArrays.requiresSequentialReads (PARQUET-246): pages
    of DELTA_BYTE_ARRAY chunks written by parquet-mr < 1.8.0 share prefix
    state with the PREVIOUS page, so page-skipping decodes of such chunks
    produce garbage — readers must decode the chunk sequentially from the
    first page. Non-parquet-mr writers are clean; missing or unparseable
    created_by is conservative (sequential)."""
    if encoding != 7:  # Encoding.DELTA_BYTE_ARRAY
        return False
    if not created_by:
        return True
    try:
        app, ver, _ = parse_created_by(created_by)
        if app != "parquet-mr":
            return False
        if not ver:
            return True
        return SemVer.parse(ver).compare(_DELTA_FIXED) < 0
    except (ValueError, AttributeError):
        return True
