"""WARC (Web ARChive, ISO 28500) source — the container format web
crawls actually ship in (Common Crawl, Internet Archive, every fetcher
derived from Heritrix/wget). The crawl-pipeline ingestion edge: WARC →
records → (html_to_text / extract_main_content / html_links) → the rest
of the corpus pipeline.

Format (public spec, ISO 28500 / IIPC WARC 1.0–1.1): a file is a
sequence of records; each record is a header block
(``WARC/1.x`` version line + ``Name: value`` lines, CRLF-terminated,
blank-line-terminated) followed by exactly ``Content-Length`` payload
bytes and the ``\\r\\n\\r\\n`` record separator. ``.warc.gz`` files gzip
each record as its OWN member (so readers can seek member boundaries);
Python's ``gzip.GzipFile`` reads concatenated members transparently,
which is all a whole-file reader needs.

Spark shape: files load through the ``binaryFile`` datasource (one row
per file: path + bytes) and a ``mapInPandas`` kernel parses records out
of each file — an Arrow-batched generator, so one task holds one file's
bytes plus the records of the batch being yielded, never the whole
corpus. WARC convention caps files at ~1 GiB (Common Crawl: ~1 GiB
gzipped members), which is the per-task memory bound; set
``payload_limit`` to drop pathological single records. Parsing is pure
Python by necessity (binary record framing has no Catalyst expression)
— this is an INGESTION boundary, run once per crawl wave and staged to
parquet, not a per-query path.

HTTP response records carry the HTTP message as payload;
``http_parse=True`` (default) splits status/headers/body so consumers
get the body bytes directly (`content_type`/`http_status` columns),
matching what warcio-based readers expose.

``record_offset`` is the LOGICAL offset: the record's start in the
DECOMPRESSED byte stream (for ``.warc.gz`` too — this reader inflates
the whole file). It orders records and keys them stably within a file,
but it is NOT the CDX-convention compressed member offset, so do not
feed it to range-request/seek tooling that expects ``warc-record-offset``
from a CDX index.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from eel_spark.datastream import DataStream
from eel_spark.sources.files import Source

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_offset", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("truncated", T.BooleanType()),
    ]
)


def _split_headers(block: bytes) -> dict[str, str]:
    """WARC/HTTP header block → {lower-name: value}; malformed lines
    are skipped (crawl archives contain them; a hard error on one line
    would poison a whole file). splitlines, not split(CRLF): the
    record loop tolerates LF-terminated writers, so the header split
    must too — CRLF-only splitting collapsed an LF block into one
    pseudo-header and silently emptied the file (r13 review)."""
    headers: dict[str, str] = {}
    for line in block.splitlines():
        if b":" in line:
            name, _, value = line.partition(b":")
            headers[name.strip().lower().decode("latin-1")] = (
                value.strip().decode("latin-1", "replace")
            )
    return headers


def parse_warc_stream(stream, path: str, http_parse: bool = True,
                      payload_limit: int | None = None):
    """Yield record dicts from a readable binary stream of WARC bytes.
    Driver-free, file-at-a-time — the kernel both the batch source and
    tests share. Stops (never raises) at a malformed record boundary:
    a torn tail is a truncated fetch — including a truncated GZIP
    member, which raises mid-read and is caught here — and the records
    before it are good. A missing inter-record separator resyncs on
    the next version line instead of eating it (r13 review)."""
    offset = 0
    pending: bytes | None = None  # a line read past a short separator
    try:
        while True:
            if pending is not None:
                version, pending = pending, None
                start = offset - len(version)
            else:
                version = stream.readline()
                start = offset
                offset += len(version)
            if not version:
                return
            if version.strip() == b"":  # stray separator tolerance
                continue
            if not version.startswith(b"WARC/"):
                return  # torn record / trailing garbage: keep what we have
            header_block = b""
            while True:
                line = stream.readline()
                offset += len(line)
                if not line:
                    return
                if line == b"\r\n" or line == b"\n":
                    break
                header_block += line
            headers = _split_headers(header_block)
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                return
            if length < 0:
                # stream.read(-1) would swallow the whole remaining file
                # into this record's payload (r13 review)
                return
            payload = stream.read(length)
            offset += len(payload)
            if len(payload) < length:
                return  # truncated tail
            # record separator: two blank lines by spec, but measure what
            # is actually there — LF-only writers use 2 bytes not 4, and
            # a MISSING separator means the line just read belongs to the
            # next record (push it back rather than destroying it)
            for _ in range(2):
                line = stream.readline()
                offset += len(line)
                if line.strip():
                    pending = line
                    break
            content_type = headers.get("content-type")
            http_status = None
            # split the HTTP message only for records DECLARED to carry
            # one — a resource/conversion record whose text happens to
            # start with 'HTTP/' must pass through intact (r13 review)
            is_http_record = (content_type or "").lower().startswith(
                "application/http"
            ) or headers.get("warc-type") == "response"
            if http_parse and is_http_record and payload[:5] == b"HTTP/":
                head, sep, body = payload.partition(b"\r\n\r\n")
                if sep:
                    status_line = head.split(b"\r\n", 1)[0].split(b" ")
                    if len(status_line) >= 2 and status_line[1].isdigit():
                        http_status = int(status_line[1])
                    http_headers = _split_headers(head)
                    content_type = http_headers.get(
                        "content-type", content_type
                    )
                    payload = body
            truncated = False
            if payload_limit is not None and len(payload) > payload_limit:
                payload = payload[: int(payload_limit)]
                truncated = True
            yield {
                "warc_file": path,
                "record_offset": start,
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": content_type,
                "http_status": http_status,
                "payload": payload,
                "truncated": truncated,
            }
    except (EOFError, OSError):
        # torn gzip member / unreadable tail: keep the records already
        # yielded — same contract as a torn plain-file tail
        return


@dataclass
class WarcSource(Source):
    """WARC files (plain or ``.warc.gz``) as a DataStream of records.

    ``pattern`` follows the binaryFile datasource's glob rules. Filter
    early on the slim columns (``warc_type = 'response'``,
    ``http_status = 200``, a ``content_type`` prefix) before touching
    payloads — the parse yields every record, but Arrow batches keep
    only what survives downstream projection. ``payload_limit`` bounds
    any single record's bytes (flagged in ``truncated``).

    The parallelism unit is the FILE (binaryFile rows don't split), so
    one file's bytes is the per-task memory bound. That matches the
    WARC convention (~1 GiB archives: Common Crawl ships thousands of
    them), but ONE giant archive would be one task and a likely OOM —
    ``max_file_bytes`` (default 1 GiB, the convention) fails LOUDLY
    with the file name and size instead. The default must sit BELOW
    the binaryFile datasource's own row cap
    (``spark.sql.sources.binaryFile.maxLength``, default ~2 GiB): a
    guard above it would be dead code — the scan layer rejects bigger
    files first with its own (less helpful) error, so files past ~2 GiB
    never reach this check. Raise both deliberately for bigger
    archives, or better: split the archive — WARC records are
    self-framing, any record boundary is a legal split point.
    """

    pattern: str
    http_parse: bool = True
    payload_limit: int | None = None
    max_file_bytes: int = 1 << 30

    def to_datastream(self, spark: SparkSession) -> DataStream:
        http_parse, payload_limit = self.http_parse, self.payload_limit
        max_file_bytes = self.max_file_bytes

        def parse(batches):
            import pandas as pd

            for pdf in batches:
                for _, row in pdf.iterrows():
                    raw = row["content"]
                    if max_file_bytes is not None and len(raw) > max_file_bytes:
                        raise ValueError(
                            f"WARC archive {row['path']!r} is "
                            f"{len(raw)} bytes > max_file_bytes="
                            f"{max_file_bytes}: one archive is one task "
                            f"(binaryFile rows don't split), so a file "
                            f"this size risks an executor OOM. Split the "
                            f"archive at record boundaries or raise "
                            f"max_file_bytes deliberately."
                        )
                    stream: io.BufferedIOBase = io.BytesIO(raw)
                    if raw[:2] == b"\x1f\x8b":
                        stream = gzip.GzipFile(fileobj=stream)  # multi-member
                    rows = []
                    for rec in parse_warc_stream(
                        stream, row["path"], http_parse, payload_limit
                    ):
                        rows.append(rec)
                        if len(rows) >= 256:  # bound the Arrow batch
                            yield pd.DataFrame(rows, columns=WARC_SCHEMA.names)
                            rows = []
                    if rows:
                        yield pd.DataFrame(rows, columns=WARC_SCHEMA.names)

        files = spark.read.format("binaryFile").load(self.pattern)
        return DataStream(
            files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)
        )


def write_warc(records: list[dict], path: str, compress: bool = False) -> None:
    """Write records as a spec-shaped WARC file (driver-side, for tests
    and fixtures — a crawler writes its own archives). Each record dict:
    ``warc_type``, ``payload`` bytes, optional ``target_uri`` /
    ``record_id`` / ``warc_date`` / ``content_type``. ``compress=True``
    gzips each record as its own member, the ``.warc.gz`` convention."""
    out = io.BytesIO()
    for i, rec in enumerate(records):
        head = [b"WARC/1.0"]
        head.append(f"WARC-Type: {rec.get('warc_type', 'resource')}".encode())
        head.append(
            f"WARC-Record-ID: {rec.get('record_id', f'<urn:uuid:rec-{i}>')}".encode()
        )
        if rec.get("target_uri"):
            head.append(f"WARC-Target-URI: {rec['target_uri']}".encode())
        head.append(
            f"WARC-Date: {rec.get('warc_date', '2024-01-01T00:00:00Z')}".encode()
        )
        if rec.get("content_type"):
            head.append(f"Content-Type: {rec['content_type']}".encode())
        payload = rec["payload"]
        head.append(f"Content-Length: {len(payload)}".encode())
        member = (
            b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )
        out.write(gzip.compress(member) if compress else member)
    with open(path, "wb") as f:
        f.write(out.getvalue())
