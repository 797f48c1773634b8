"""WARC (Web ARChive, ISO 28500) ingestion — the CommonCrawl shape.

Every large-scale web-text pipeline starts from WARC: a stream of
length-delimited records (``warcinfo``, ``request``, ``response``)
where each response wraps a full HTTP message whose body is the HTML
the pipeline actually wants. CommonCrawl ships ``.warc.gz`` files as
CONCATENATED PER-RECORD GZIP MEMBERS so a reader can seek to a byte
offset and decompress one record without touching the rest; a
correct reader must therefore handle multi-member gzip, which
single-shot ``zlib.decompress`` does not.

Spark-first shape: one WARC file is one binary asset row; the record
walk is an Arrow ``mapInPandas`` one-to-many expansion (the same
shape as the video frame-sampling lane), so payload bytes never
shuffle and each partition's files decode in parallel. Downstream
(HTML→text, quality gates, dedup) is the existing JVM-side text
family — the parser emits plain string/long columns only.

The synth writes both layouts (plain WARC / per-record gzip members
by asset parity) with every field a closed form of ``asset_id``, so
the DuckDB oracle replays the full record surface without reading a
byte. Reference for the record grammar: ISO 28500 / the public WARC
1.0 spec; gzip member framing: RFC 1952 §2.2 (members are simply
concatenated).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..operators.multimodal import ASSET_SCHEMA

WARC_RECORD_SCHEMA = (
    "asset_id long, record_idx int, warc_type string, "
    "target_uri string, http_status long, http_content_type string, "
    "body string, body_len long"
)

_WARCINFO_BLOCK = b"software: geniepool-etl-spark synth\r\n"


def _designed_html(aid: int, r: int) -> bytes:
    """The response body of record ``r`` (1-based) of asset ``aid`` —
    strip_html of this is ``'d{aid} ' + 'tok '*r + 'p{aid} r{r}'``,
    a pure concat/repeat the oracle rebuilds in SQL."""
    return (
        f"<html><head><title>d{aid}</title></head><body><p>"
        + "tok " * r
        + f"p{aid} r{r}</p></body></html>"
    ).encode("ascii")


def _warc_record(headers: list, block: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        k.encode("ascii") + b": " + v.encode("ascii") + b"\r\n"
        for k, v in headers
    )
    head += b"Content-Length: %d\r\n\r\n" % len(block)
    return head + block + b"\r\n\r\n"


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (RFC 1952): zlib's gzip
    container writes MTIME=0, unlike the gzip module's wall-clock
    default."""
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def synth_warc_assets(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Synthesize one WARC file per input row: a ``warcinfo`` record
    followed by ``2 + aid % 3`` ``response`` records whose URI,
    status (404 when ``(aid + r) % 5 == 0``), and HTML body are
    closed forms of ``asset_id``. Odd assets are written as
    CommonCrawl-style concatenated per-record gzip members, even
    assets as plain WARC. Arrow ``mapInPandas``; narrow."""

    def one(aid: int) -> bytes:
        records = [
            _warc_record(
                [
                    ("WARC-Type", "warcinfo"),
                    (
                        "WARC-Record-ID",
                        f"<urn:uuid:00000000-0000-4000-8000-{aid:012d}>",
                    ),
                    ("WARC-Date", "2024-01-01T00:00:00Z"),
                    ("Content-Type", "application/warc-fields"),
                ],
                _WARCINFO_BLOCK,
            )
        ]
        for r in range(1, 3 + aid % 3):
            body = _designed_html(aid, r)
            status = (
                b"HTTP/1.1 404 Not Found"
                if (aid + r) % 5 == 0
                else b"HTTP/1.1 200 OK"
            )
            block = (
                status
                + b"\r\nContent-Type: text/html; charset=utf-8\r\n"
                + b"X-Served-By: synth\r\n\r\n"
                + body
            )
            records.append(
                _warc_record(
                    [
                        ("WARC-Type", "response"),
                        (
                            "WARC-Record-ID",
                            "<urn:uuid:00000000-0000-4000-8000-"
                            f"{aid:08d}{r:04d}>",
                        ),
                        ("WARC-Date", "2024-01-01T00:00:00Z"),
                        (
                            "WARC-Target-URI",
                            f"https://site{aid % 7}.example/p/{r}",
                        ),
                        (
                            "Content-Type",
                            "application/http; msgtype=response",
                        ),
                    ],
                    block,
                )
            )
        if aid % 2 == 1:
            return b"".join(_gzip_member(rec) for rec in records)
        return b"".join(records)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "payload": [one(int(a)) for a in pdf[id_col]],
                    "media_type": "application/warc",
                }
            )

    return df.mapInPandas(batches, ASSET_SCHEMA)


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress CONCATENATED gzip members (RFC 1952 §2.2 — the
    CommonCrawl layout) by chaining ``decompressobj`` over
    ``unused_data``; a single-member file and a multi-member file
    decode identically."""
    out = []
    rest = raw
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(rest))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        rest = d.unused_data
    if rest:
        raise ValueError("warc: trailing garbage after gzip members")
    return b"".join(out)


def _parse_warc(raw: bytes) -> list:
    """Walk WARC/1.x records: version line, CRLF headers, empty line,
    ``Content-Length`` octets of block, CRLF CRLF separator. For
    ``application/http`` response records the HTTP message inside the
    block is split into status / headers / body. Returns one tuple
    per record."""
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
    rows = []
    at, idx = 0, 0
    while at < len(raw):
        end = raw.find(b"\r\n", at)
        if end < 0 or raw[at:end] not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError("warc: bad version line")
        at = end + 2
        hdrs = {}
        while True:
            end = raw.find(b"\r\n", at)
            if end < 0:
                raise ValueError("warc: unterminated header block")
            line = raw[at:end]
            at = end + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError("warc: missing/bad Content-Length")
        if at + clen > len(raw):
            raise ValueError("warc: truncated record block")
        block = raw[at : at + clen]
        at += clen
        if raw[at : at + 4] != b"\r\n\r\n":
            raise ValueError("warc: missing record separator")
        at += 4
        wtype = hdrs.get(b"warc-type", b"").decode("ascii", "replace")
        uri = hdrs.get(b"warc-target-uri")
        uri = uri.decode("ascii", "replace") if uri is not None else None
        status = ctype = body = None
        if wtype == "response" and hdrs.get(
            b"content-type", b""
        ).startswith(b"application/http"):
            sep = block.find(b"\r\n\r\n")
            if sep < 0:
                raise ValueError("warc: bad http message")
            head, body_b = block[:sep], block[sep + 4 :]
            lines = head.split(b"\r\n")
            parts = lines[0].split(b" ", 2)
            if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
                raise ValueError("warc: bad http status line")
            status = int(parts[1])
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-type":
                    ctype = v.strip().decode("ascii", "replace")
            body = body_b.decode("utf-8", "replace")
        rows.append(
            (
                idx,
                wtype,
                uri,
                status,
                ctype,
                body,
                len(block) if body is None else len(body.encode("utf-8")),
            )
        )
        idx += 1
    return rows


def parse_warc_records(assets: DataFrame) -> DataFrame:
    """WARC → one row per record (Arrow ``mapInPandas`` one-to-many,
    the frame-sampling shape): record index in file order, WARC
    type, target URI, HTTP status / Content-Type / decoded body for
    ``application/http`` responses, and the block (or body) octet
    length. Handles plain WARC and concatenated per-record gzip
    members transparently. Poison (truncated member, bad framing,
    missing separators) yields the single null row ``record_idx
    -1`` — one bad crawl file must never kill a 100 TB stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "asset_id", "record_idx", "warc_type", "target_uri",
            "http_status", "http_content_type", "body", "body_len",
        ]
        for pdf in it:
            rows = []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    for rec in _parse_warc(bytes(b)):
                        rows.append((int(aid),) + rec)
                except Exception:
                    rows.append(
                        (int(aid), -1, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(batches, WARC_RECORD_SCHEMA)
