"""WARC (ISO 28500) record parsing -- the Common-Crawl ingest format.

The north-star input is "an Iceberg table of Common-Crawl-style pages";
upstream of that table sits the WARC archive itself.  This module parses
the format for real: version line, named WARC headers, Content-Length-
delimited blocks, and for response records the embedded HTTP/1.1 message
(status line, headers, body) -- including the Content-Type charset
parameter, which feeds the extract stage's existing `content_type`
decoder seeding (parser/charset.py; a <meta> charset still overrides it,
mirroring the reference's mid-stream decoder switch).

Scope: uncompressed records (the per-record gzip members of a .warc.gz
are a file-ingest concern: Spark's binaryFile source + zlib member
splitting; the record grammar below is identical either way).  Chunked
transfer-encoding bodies are de-chunked; truncated records yield an
error marker, never an exception.
"""

from __future__ import annotations

import re

_CRLF2 = re.compile(rb"\r?\n\r?\n")
# no ^ anchor: used with .match(body, pos), and ^ only matches at the
# true string start, which would stop de-chunking after the first chunk
_CHUNK_RE = re.compile(rb"([0-9A-Fa-f]+)[^\r\n]*\r?\n")


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block (after the first line) -> {lower-name: value}."""
    out: dict[str, str] = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
    return out


def _dechunk(body: bytes) -> bytes:
    out = bytearray()
    i = 0
    while True:
        m = _CHUNK_RE.match(body, i)
        if not m:
            break
        size = int(m.group(1), 16)
        if size == 0:
            break
        start = m.end()
        out += body[start:start + size]
        i = start + size
        # skip the chunk-terminating CRLF
        if body[i:i + 2] == b"\r\n":
            i += 2
        elif body[i:i + 1] == b"\n":
            i += 1
    return bytes(out)


def parse_warc_record(record: bytes) -> dict:
    """One WARC record -> {warc_type, url, warc_date, content_type,
    http_status, html, error}.  For response records `html` is the HTTP
    body bytes and `content_type` the HTTP Content-Type header (charset
    parameter intact); for other record types html is None."""
    nul = {"warc_type": None, "url": None, "warc_date": None,
           "content_type": None, "http_status": None, "html": None}
    if not record.startswith(b"WARC/"):
        return {**nul, "error": "not-warc"}
    m = _CRLF2.search(record)
    if not m:
        return {**nul, "error": "truncated-headers"}
    head = record[:m.start()]
    body = record[m.end():]
    first_nl = head.find(b"\n")
    headers = _parse_headers(head[first_nl + 1:] if first_nl >= 0 else b"")
    wtype = headers.get("warc-type")
    url = headers.get("warc-target-uri")
    date = headers.get("warc-date")
    try:
        clen = int(headers.get("content-length", ""))
        body = body[:clen]
    except ValueError:
        pass  # no/broken length: body runs to end of the record slice
    out = {**nul, "warc_type": wtype, "url": url, "warc_date": date,
           "error": None}
    is_http = "application/http" in headers.get("content-type", "")
    if wtype == "conversion":
        # WET-style conversion record (ISO 28500 §6.8): no HTTP wrapper,
        # the body IS the converted payload and the WARC-header
        # Content-Type describes it (text/plain for WET)
        return {**out, "content_type": headers.get("content-type"),
                "html": body}
    if wtype != "response" or not is_http:
        return out
    hm = _CRLF2.search(body)
    if not hm:
        return {**out, "error": "truncated-http"}
    http_head = body[:hm.start()]
    html = body[hm.end():]
    status_line = http_head.split(b"\n", 1)[0].rstrip(b"\r")
    parts = status_line.split()
    status = None
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    hh = _parse_headers(http_head[len(status_line):])
    if hh.get("transfer-encoding", "").lower() == "chunked":
        html = _dechunk(html)
    return {**out, "http_status": status,
            "content_type": hh.get("content-type"), "html": html}


def _record_end_by_length(data: bytes, j: int) -> int | None:
    """Exclusive end index of the payload of the record whose WARC/
    magic sits at j, derived from its Content-Length header; None when
    the headers are truncated or the length is absent/broken/past EOF
    (the caller then falls back to magic resync)."""
    m = _CRLF2.search(data, j)
    if not m:
        return None
    head = data[j:m.start()]
    first_nl = head.find(b"\n")
    headers = _parse_headers(head[first_nl + 1:] if first_nl >= 0 else b"")
    try:
        clen = int(headers.get("content-length", ""))
    except ValueError:
        return None
    end = m.end() + clen
    if clen < 0 or end > len(data):
        return None
    return end


def split_warc_file(data: bytes) -> list[bytes]:
    """Split a (decompressed) .warc file into record slices.  Records
    are walked by their Content-Length header first (ISO 28500's own
    framing -- a payload containing blank lines or even an embedded
    "WARC/" magic cannot break the split); magic resync on the next
    blank-line + WARC/ boundary is the fallback when a length is
    absent, corrupt, or does not land on a record boundary, so one bad
    length cannot swallow the rest of the file."""
    out = []
    i = 0
    n = len(data)
    while i < n:
        j = data.find(b"WARC/", i)
        if j < 0:
            break
        end = _record_end_by_length(data, j)
        if end is not None:
            # consume the record-terminating blank lines (two CRLFs per
            # ISO 28500; tolerate bare LFs and sink-added newlines)
            k = end
            while k < n and data[k] in (0x0D, 0x0A):
                k += 1
            if k == n or data.startswith(b"WARC/", k):
                out.append(data[j:k])
                i = k
                continue
            # length did not land on a record boundary: corrupt length,
            # fall through to magic resync
        k = data.find(b"\r\n\r\nWARC/", j)
        if k < 0:
            k2 = data.find(b"\n\nWARC/", j)
            if k2 < 0:
                out.append(data[j:])
                break
            out.append(data[j:k2 + 2])
            i = k2 + 2
            continue
        out.append(data[j:k + 4])
        i = k + 4
    return out
