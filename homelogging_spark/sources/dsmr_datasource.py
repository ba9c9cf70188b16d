"""S3 as a first-class Spark 4 Python DataSource: ``spark.read.format``
over raw DSMR P1 capture files.

The reference's P1 logger reads the serial stream and frames telegrams
between ``/`` and ``!`` (``P1/P1Logger.cs:19-93``). At rest those
captures are plain text files with telegrams back to back — this module
makes them a *native read format*:

    spark.dataSource.register(DsmrTelegramDataSource)
    spark.read.format("dsmr_telegram").load("/captures/*.p1")

which frames each telegram into one row (path, telegram index,
identification header, full telegram text); ``sources/dsmr.
parse_telegram`` then turns the telegram column into typed OBIS series
exactly as for any other telegram frame. Framing + parsing stay
separate on purpose: the parser is shared with the oracle-gated
``dsmr_parse`` query, and the DataSource only does what a FileScan
cannot — stateful record framing across lines.

Scale: one ``InputPartition`` per capture file — the same
parallelism contract as Spark's own text source (P1 captures rotate
hourly/daily, so files are many and bounded); framing is a single
linear pass per file, and all typed parsing happens in codegen'd
column expressions downstream, not in Python. For multi-GB single
files the partitioner would split on byte ranges and resync on the
next ``/`` — noted, not needed for rotating captures.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA_DDL = (
    "path string, telegram_idx bigint, identification string, telegram string"
)


def frame_telegrams(text: str) -> list[str]:
    """Split a capture into telegram frames.

    A frame starts at a line beginning with ``/`` and ends at the first
    following line beginning with ``!`` (checksum line included in the
    frame, as the reference's parser receives it). Garbage outside
    frames — partial lines from serial noise before the first ``/``,
    trailing junk — is dropped, mirroring the reference's resync
    behavior. An unterminated trailing frame is dropped too (the next
    capture file re-reads it whole)."""
    # the reference scrubs NUL characters before framing
    # (``data.Replace("\0", "")``, P1/P1Logger.cs:64 — a known hardware
    # bug injects them); mirror it so captures with NULs parse identically
    text = text.replace("\0", "")
    frames: list[str] = []
    current: list[str] | None = None
    for line in text.splitlines():
        if line.startswith("/"):
            current = [line]  # a new '/' always resyncs, mid-frame or not
        elif current is not None:
            current.append(line)
            if line.startswith("!"):
                frames.append("\n".join(current))
                current = None
    return frames


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class DsmrTelegramReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dsmr_telegram: .load(path) is required")

    def partitions(self) -> Sequence[InputPartition]:
        paths = (
            sorted(glob.glob(self.path))
            if any(ch in self.path for ch in "*?[")
            else (
                sorted(
                    p
                    for f in os.listdir(self.path)
                    if not f.startswith(("_", "."))
                    # skip subdirectories — a dir entry would become an
                    # InputPartition and fail at read() (ADVICE r5)
                    if os.path.isfile(p := os.path.join(self.path, f))
                )
                if os.path.isdir(self.path)
                else [self.path]
            )
        )
        if not paths:
            raise FileNotFoundError(f"dsmr_telegram: no files match {self.path}")
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8", errors="replace") as f:
            text = f.read()
        for i, tele in enumerate(frame_telegrams(text)):
            ident = tele[1:].split("\n", 1)[0].strip()
            yield (partition.path, i, ident, tele)


class DsmrTelegramDataSource(DataSource):
    """``format("dsmr_telegram")`` — register with
    ``spark.dataSource.register(DsmrTelegramDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "dsmr_telegram"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return DsmrTelegramReader(self.options)

    def simpleStreamReader(self, schema) -> "DsmrTelegramStreamReader":
        return DsmrTelegramStreamReader(self.options)


class DsmrTelegramStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: tail a capture DIRECTORY, the reference's
    continuous-poll shape (``P1/P1Logger.cs`` reads the serial stream
    forever; rotated capture files landing in a directory are its
    at-rest equivalent).

    Offsets are ``{"files": {path: n_frames_emitted}}`` — replayable
    and exactly-once per frame: a grown file re-frames from the start
    (framing is stateless and cheap) and emits only frames past the
    recorded count, so appends to the CURRENT capture file stream
    incrementally while rotated files are emitted once. Files are
    processed in sorted-name order (rotation names sort by time)."""

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("dsmr_telegram stream: .load(path) is required")

    def _files(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return sorted(glob.glob(self.dir))
        return sorted(
            p
            for f in os.listdir(self.dir)
            if not f.startswith(("_", "."))
            if os.path.isfile(p := os.path.join(self.dir, f))
        )

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _frames_of(self, path: str) -> list[str]:
        try:
            with open(path, encoding="utf-8", errors="replace") as f:
                return frame_telegrams(f.read())
        except OSError:
            return []

    def read(self, start: dict):
        seen = dict(start.get("files", {}))
        rows = []
        for path in self._files():
            frames = self._frames_of(path)
            done = seen.get(path, 0)
            for i, tele in enumerate(frames[done:], start=done):
                ident = tele[1:].split("\n", 1)[0].strip()
                rows.append((path, i, ident, tele))
            if len(frames) > done:
                seen[path] = len(frames)
        return iter(rows), {"files": seen}

    def readBetweenOffsets(self, start: dict, end: dict):
        a, b = start.get("files", {}), end.get("files", {})
        rows = []
        for path, hi in b.items():
            lo = a.get(path, 0)
            if hi > lo:
                frames = self._frames_of(path)
                for i, tele in enumerate(frames[lo:hi], start=lo):
                    ident = tele[1:].split("\n", 1)[0].strip()
                    rows.append((path, i, ident, tele))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass
