"""WARC (ISO 28500) record parsing — the Common Crawl wire format.

Crawl archives ship as ``.warc.gz`` files: CONCATENATED gzip members,
one WARC record per member, so a reader can seek to any record without
decompressing the file prefix.  Each record is::

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: http://example.com/\\r\\n
    WARC-Date: 2025-01-01T00:00:00Z\\r\\n
    Content-Length: <n>\\r\\n
    \\r\\n
    <n payload bytes>\\r\\n\\r\\n

For ``response`` records the payload is the raw HTTP response (status
line + headers + body); the page bytes the extraction pipeline wants are
the HTTP BODY.  ``conversion`` records (the ``.warc.wet`` flavour) carry
the body directly.

Everything here is stdlib-only (``zlib`` handles the multi-member gzip
stream) and deterministic: a malformed record never raises — it is
skipped and COUNTED, surfacing through the reader's ``warc_errors``
audit column (the never-silent policy; a crawl file with a torn tail is
routine, a parser that hides it is not).  The builder exists so tests
and fixtures can round-trip: ``parse(build(records)) == records``
byte-for-byte.

Sizing note for the 100 TB deployment: one ``.warc.gz`` is ~1 GiB and is
processed as ONE task (the Common Crawl convention — the gzip members
give intra-file random access, but Spark's binaryFile source ships whole
files; a listing of 100k files saturates any executor count long before
per-file parallelism matters).  ``sources.read_pages_warc`` documents
the partition math.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def gunzip_members(data: bytes) -> bytes:
    """Decompress a multi-member gzip stream (the .warc.gz layout).

    Plain (non-gzip) input is returned unchanged — the reader handles
    both flavours with one code path.  A torn final member yields the
    bytes decoded so far (the record parser then counts the torn tail
    as an error instead of raising here)."""
    return _gunzip_members_ex(data)[0]


def _gunzip_members_ex(data: bytes) -> tuple[bytes, bool]:
    """(decompressed bytes, corrupt) — ``corrupt`` is True when a member
    ABORTED on a zlib error (a bit-flip, not mere truncation).  The
    erroring member contributes no bytes, so if the prior members end at
    a record boundary the parser would otherwise finish CLEANLY and the
    file's lost tail would be silent — the reader turns the flag into an
    error row instead (never-silent policy).  Truncation (incomplete
    final member) keeps its partial bytes and surfaces through the
    parser's torn-record rows, as before."""
    if data[:2] != b"\x1f\x8b":
        return data, False
    out: list[bytes] = []
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
        except zlib.error:
            return b"".join(out), True
        if not d.eof:  # torn final member — keep what decoded
            break
        data = d.unused_data
        if data[:2] != b"\x1f\x8b":
            break
    return b"".join(out), False


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block → {lower-name: value}; first occurrence wins;
    malformed lines are ignored (crawl reality)."""
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        name, sep, value = line.partition(b":")
        if not sep or not name:
            continue
        key = name.strip().decode("ascii", "replace").lower()
        if key not in headers:
            headers[key] = value.strip().decode("utf-8", "replace")
    return headers


# bound on a decoded HTTP body (content-encoding inflate): hostile crawl
# payloads must not be able to balloon an executor; well above the 4 MiB
# HTML decode guard that applies downstream anyway.
MAX_HTTP_BODY_BYTES = 64 * 1024 * 1024


def _dechunk(body: bytes) -> bytes | None:
    """Decode Transfer-Encoding: chunked framing; None when malformed
    (the caller then hands the RAW body to the payload sniffer, whose
    failure is a visible per-doc PARSE_ERROR — never silent)."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        if size < 0:
            # int(b'-6', 16) parses — and pos += size + 2 would stand
            # still, re-reading the same bytes FOREVER (one hostile page
            # wedging the whole file's task)
            return None
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) are not content
        if pos + size > len(body) or len(out) + size > MAX_HTTP_BODY_BYTES:
            return None
        out += body[pos:pos + size]
        pos += size + 2  # chunk data + its CRLF


def _decode_content(body: bytes, encoding: str) -> bytes | None:
    """Decode Content-Encoding gzip/deflate with a bounded inflate;
    None when corrupt/oversize (raw-body fallback, same rationale as
    :func:`_dechunk`)."""
    # deflate is zlib-wrapped per spec but raw in the wild — try both
    variants = (31,) if encoding in ("gzip", "x-gzip") else (15, -15)
    for wb in variants:
        out = bytearray()
        data = body
        ok = True
        # loop MEMBERS: servers and wget-written archives emit
        # multi-member gzip, and stopping at the first member silently
        # truncated the page ('part-two' vanished with no error); any
        # non-gzip leftover after a member is a decode FAILURE (raw
        # fallback makes it visible), never a silent cut
        while data:
            try:
                d = zlib.decompressobj(wbits=wb)
                out += d.decompress(data, MAX_HTTP_BODY_BYTES + 1)
            except zlib.error:
                ok = False
                break
            if len(out) > MAX_HTTP_BODY_BYTES or d.unconsumed_tail:
                ok = False
                break
            if d.unused_data == data:
                ok = False  # no progress — malformed stream
                break
            data = d.unused_data
        if ok:
            # an empty decode of a well-formed stream is a CORRECT
            # decode (a legitimately empty page), not a failure — the
            # old 'not out' clause handed the raw gzip bytes downstream
            # as the page html
            return bytes(out)
    return None


def split_http_payload(payload: bytes) -> bytes:
    """HTTP response payload → body bytes: header block stripped,
    Transfer-Encoding: chunked framing removed, Content-Encoding
    gzip/deflate inflated (bounded).

    wget/heritrix archives preserve the wire bytes, so without the
    transfer decode a chunked page reaches the HTML parser with hex
    chunk-size lines interleaved into the text (silent corruption) and
    a gzip body fails the sniff as an opaque PARSE_ERROR.  Malformed
    framing/encoding falls back to the RAW body — the sniffer's failure
    is a visible per-doc error, never a wrong silent decode.

    Payloads that do not start with ``HTTP/`` are returned whole (a
    ``conversion`` record, or a server that spoke garbage — the
    extraction pipeline's payload sniff handles either)."""
    if not payload.startswith(b"HTTP/"):
        return payload
    idx = payload.find(_SEP)
    if idx < 0:
        return b""
    headers = _parse_headers(payload[:idx])
    body = payload[idx + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        dechunked = _dechunk(body)
        if dechunked is not None:
            body = dechunked
    ce = headers.get("content-encoding", "").strip().lower()
    if ce in ("gzip", "x-gzip", "deflate"):
        decoded = _decode_content(body, ce)
        if decoded is not None:
            body = decoded
    return body


def iter_warc_records(data: bytes):
    """Yield ``(headers: dict, payload: bytes)`` per well-formed record;
    sets ``headers['_error']`` and stops on a torn/malformed tail.

    Walks by Content-Length (never scans payload bytes for markers — a
    payload may legally contain ``WARC/1.0``)."""
    raw_len = len(data)
    data, corrupt = _gunzip_members_ex(data)
    if raw_len and not data:  # gzip stream decoded to nothing: not silence
        yield {"_error": "torn-gzip"}, b""
        return
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            yield {"_error": "bad-magic"}, b""
            return
        hdr_end = data.find(_SEP, pos)
        if hdr_end < 0:
            yield {"_error": "torn-header"}, b""
            return
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            yield {"_error": "bad-length"}, b""
            return
        if length < 0:
            # int() accepts a sign; a negative length would move pos
            # BACKWARD (or nowhere) and re-parse the same record forever
            yield {"_error": "bad-length"}, b""
            return
        body_start = hdr_end + 4
        if body_start + length > n:
            yield {"_error": "torn-payload"}, b""
            return
        yield headers, data[body_start:body_start + length]
        pos = body_start + length
    if corrupt:
        # a member aborted mid-file: everything after it is lost even
        # though the records before it parsed cleanly
        yield {"_error": "corrupt-gzip-member"}, b""


def _stream_decompress(fileobj, chunk: int, corrupt_flag: list | None = None):
    """Yield decompressed chunks from a (possibly multistream-gzip) file
    object — ``gunzip_members`` re-expressed incrementally, so a 1 GiB
    crawl archive never materializes its ~4 GiB decompressed form.

    Parity rules mirror the buffer version exactly: plain input passes
    through; member boundaries chain while the next member starts with
    gzip magic; a torn final member keeps the bytes decoded so far."""
    head = fileobj.read(2)
    if head[:2] != b"\x1f\x8b":
        if head:
            yield head
        while True:
            b = fileobj.read(chunk)
            if not b:
                return
            yield b
    pending = head  # compressed bytes not yet fed to a decompressor
    d = zlib.decompressobj(wbits=31)
    eof = False
    while True:
        if not pending and not eof:
            pending = fileobj.read(chunk)
            eof = not pending
        if d is None:
            # between members: need 2 bytes to check the next magic
            while len(pending) < 2 and not eof:
                more = fileobj.read(chunk)
                if not more:
                    eof = True
                else:
                    pending += more
            if pending[:2] != b"\x1f\x8b":
                return  # trailing garbage — stop, as gunzip_members does
            d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(pending)
        except zlib.error:
            if corrupt_flag is not None:
                corrupt_flag[0] = True
            return  # corrupt member — keep what decoded, flag the abort
        if out:
            yield out
        if d.eof:
            pending = d.unused_data
            d = None
            if not pending and eof:
                return
        else:
            pending = b""
            if eof:
                return  # torn final member — keep what decoded


def iter_warc_records_stream(fileobj, chunk: int = 1 << 20):
    """``iter_warc_records`` over a FILE OBJECT with bounded memory:
    peak = O(chunk + one record) instead of compressed + decompressed +
    parsed (the buffer version's ~5× file size).  Yields the identical
    ``(headers, payload)`` / ``{'_error': ...}`` protocol — parity with
    the buffer version is pinned byte-for-byte across chunk sizes in
    tests/test_warc.py for well-formed AND truncated archives.  On a
    CORRUPT gzip member (bit-flip, not truncation) both readers surface
    at least one error row and lose the file's tail, but the salvaged
    prefix of the corrupt member itself may differ: the buffer reader
    discards that member's bytes wholesale, the stream reader keeps the
    chunks decoded before the abort."""
    raw_seen = 0
    real_read = fileobj.read

    def counted_read(k):
        nonlocal raw_seen
        b = real_read(k)
        raw_seen += len(b)
        return b

    reader = type("R", (), {"read": staticmethod(counted_read)})()
    corrupt = [False]
    gen = _stream_decompress(reader, chunk, corrupt)
    buf = bytearray()
    eof = False
    saw_output = False

    def fill() -> None:
        nonlocal eof, saw_output
        try:
            piece = next(gen)
            buf.extend(piece)
            saw_output = saw_output or bool(piece)
        except StopIteration:
            eof = True

    fill()
    if eof and not saw_output:
        # distinguish empty input (no records, no error) from a gzip
        # stream that decoded to nothing (torn-gzip, never silent)
        if raw_seen:
            yield {"_error": "torn-gzip"}, b""
        return
    while True:
        # tolerate inter-record padding
        while True:
            while len(buf) < 2 and not eof:
                fill()
            if buf[:2] == _CRLF:
                del buf[:2]
            else:
                break
        if not buf and eof:
            if corrupt[0]:
                # same never-silent rule as the buffer reader: a member
                # aborted on a zlib error loses the file's tail
                yield {"_error": "corrupt-gzip-member"}, b""
            return
        while len(buf) < 5 and not eof:
            fill()
        if not bytes(buf[:5]).startswith(b"WARC/"):
            yield {"_error": "bad-magic"}, b""
            return
        while (hdr_end := buf.find(_SEP)) < 0:
            if eof:
                yield {"_error": "torn-header"}, b""
                return
            fill()
        headers = _parse_headers(bytes(buf[:hdr_end]))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            yield {"_error": "bad-length"}, b""
            return
        if length < 0:
            # same infinite-loop guard as the whole-buffer reader:
            # del buf[:body_start + length] with a negative length
            # stands still forever
            yield {"_error": "bad-length"}, b""
            return
        body_start = hdr_end + 4
        while len(buf) < body_start + length:
            if eof:
                yield {"_error": "torn-payload"}, b""
                return
            fill()
        yield headers, bytes(buf[body_start:body_start + length])
        del buf[:body_start + length]


def parse_warc_date(value: str) -> datetime | None:
    """WARC-Date (ISO 8601 ``...Z``) → aware UTC datetime, None if bad."""
    try:
        return datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        pass
    try:
        # WARC/1.1 allows fractional seconds (browsertrix et al.); the
        # whole-second-only parse dropped EVERY record of such archives
        return datetime.strptime(value, "%Y-%m-%dT%H:%M:%S.%fZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


_KEEP_TYPES = frozenset(("response", "conversion"))


def iter_pages(records, err_count: list[int]):
    """(headers, payload) iterator → yields page dicts
    ``{"url", "warc_ts": datetime, "html": bytes}`` — the input-table
    shape minus the constant columns.  Records that are not
    response/conversion (warcinfo, request, metadata) are skipped
    silently (they are structure, not content); records with a missing
    URI/date or a torn tail are COUNTED into ``err_count[0]`` (a
    mutable cell so streaming callers can read the total after
    exhaustion).  Shared by the whole-buffer and streaming readers, so
    their page semantics cannot drift."""
    for headers, payload in records:
        if "_error" in headers:
            err_count[0] += 1
            continue
        if headers.get("warc-type") not in _KEEP_TYPES:
            continue
        url = headers.get("warc-target-uri", "")
        ts = parse_warc_date(headers.get("warc-date", ""))
        if not url or ts is None:
            err_count[0] += 1
            continue
        # only response records carry HTTP wire bytes; a conversion
        # (WET) record's body IS the content — a text body that happens
        # to start with 'HTTP/' must not be gutted as fake headers
        body = (
            split_http_payload(payload)
            if headers.get("warc-type") == "response"
            else payload
        )
        yield {"url": url, "warc_ts": ts, "html": body}


def extract_pages(data: bytes) -> tuple[list[dict], int]:
    """One WARC file's bytes → (pages, n_errors)."""
    err = [0]
    pages = list(iter_pages(iter_warc_records(data), err))
    return pages, err[0]


# ---------------------------------------------------------------------------
# builder (fixtures / tests / the round-trip oracle)

def build_record(
    url: str,
    date: str,
    body: bytes,
    warc_type: str = "response",
    http_headers: bytes = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n",
) -> bytes:
    """One WARC record, byte-exact per the spec grammar above."""
    payload = (
        http_headers + _CRLF + body if warc_type == "response" else body
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: " + warc_type.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
    )
    return head + _CRLF + payload + _SEP


def build_warc(records: list[bytes], gzip_members: bool = True) -> bytes:
    """Records → one .warc(.gz) file's bytes (one gzip member per record
    when ``gzip_members`` — the Common Crawl layout).  mtime is pinned to
    0 and OS byte to 255 so the output is byte-deterministic."""
    if not gzip_members:
        return b"".join(records)
    out = []
    for rec in records:
        c = zlib.compressobj(9, zlib.DEFLATED, 31)
        # wbits=31 writes a gzip header with mtime=0, os=255 — stable
        out.append(c.compress(rec) + c.flush())
    return b"".join(out)
