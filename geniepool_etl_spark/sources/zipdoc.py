"""ZIP container walk + DOCX (WordprocessingML) text extraction.

Office documents and EPUBs — a real slice of any document training
corpus — are ZIP archives (APPNOTE.TXT format): little-endian local
file headers, a central directory, and an end-of-central-directory
(EOCD) record found by scanning back from the file tail. The walk
here is hand-written from the public APPNOTE layout: EOCD → central
directory entries → each member's LOCAL header (whose filename/extra
lengths may differ from the central entry's — the classic interop
trap), payload ``stored`` (method 0) or ``deflate`` (method 8, raw
``zlib`` window -15), CRC-32 verified on every member so one flipped
bit is poison, never silently-wrong text.

DOCX is ZIP + ``word/document.xml``: paragraphs are ``<w:p>`` blocks,
text lives in ``<w:t>`` runs (``<w:tab/>`` → TAB, ``<w:br/>`` →
newline), XML entities decode. The extractor walks that structure
with anchored regexes — fine for the conformant single-part
documents the synth writes; documents with revision markup or parts
split across ``document.xml.rels`` targets are a declared boundary
(poison → null row, never a failed stage).

Spark-first shape: one archive is one binary asset row; member
listing is an Arrow ``mapInPandas`` one-to-many expansion and text
extraction is one-to-one — payload bytes never shuffle; downstream
is the existing JVM text family.

Out of scope (poison → null row): encryption (general-purpose flag
bit 0), streaming data descriptors (flag bit 3), ZIP64, and any
compression method other than stored/deflate.
"""

from __future__ import annotations

import re
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..operators.multimodal import ASSET_SCHEMA

ZIP_MEMBER_SCHEMA = (
    "asset_id long, member_idx int, member_name string, "
    "method string, n_bytes long, crc_ok boolean"
)

DOCX_TEXT_SCHEMA = (
    "asset_id long, text string, n_paragraphs int, n_chars long"
)

_EOCD_SIG = b"PK\x05\x06"
_CDE_SIG = b"PK\x01\x02"
_LFH_SIG = b"PK\x03\x04"


def _zip_members(raw: bytes) -> list:
    """EOCD-anchored member walk. Returns ``[(name, method, data),
    …]`` in central-directory order with CRC-32 verified; raises on
    any framing violation or out-of-scope feature."""
    # EOCD: fixed 22 bytes + comment (≤ 65535) — scan back from tail.
    tail_from = max(0, len(raw) - 22 - 65535)
    at = raw.rfind(_EOCD_SIG, tail_from)
    if at < 0:
        raise ValueError("zip: no EOCD record")
    if at + 22 > len(raw):
        raise ValueError("zip: truncated EOCD")
    (n_disk, n_start, n_here, n_total, cd_size, cd_off, clen) = (
        struct.unpack("<HHHHIIH", raw[at + 4 : at + 22])
    )
    if n_disk or n_start:
        raise ValueError("zip: multi-disk archives out of scope")
    if n_here != n_total:
        raise ValueError("zip: inconsistent entry counts")
    if cd_off + cd_size > at:
        raise ValueError("zip: central directory overruns EOCD")
    out = []
    p = cd_off
    for _ in range(n_total):
        if raw[p : p + 4] != _CDE_SIG:
            raise ValueError("zip: bad central-directory signature")
        (
            _vmade, _vneed, flags, method, _t, _d, crc, csize, usize,
            nlen, xlen, klen, _disk, _iattr, _eattr, lfh_off,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", raw[p + 4 : p + 46])
        name = raw[p + 46 : p + 46 + nlen].decode("utf-8")
        p += 46 + nlen + xlen + klen
        if flags & 0x0001:
            raise ValueError("zip: encrypted member out of scope")
        if flags & 0x0008:
            raise ValueError("zip: data descriptors out of scope")
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF:
            raise ValueError("zip: ZIP64 out of scope")
        # LOCAL header: its own name/extra lengths govern the data
        # offset (they may differ from the central entry's).
        if raw[lfh_off : lfh_off + 4] != _LFH_SIG:
            raise ValueError("zip: bad local-header signature")
        lnlen, lxlen = struct.unpack(
            "<HH", raw[lfh_off + 26 : lfh_off + 30]
        )
        data_at = lfh_off + 30 + lnlen + lxlen
        if data_at + csize > len(raw):
            raise ValueError("zip: truncated member data")
        blob = raw[data_at : data_at + csize]
        if method == 0:
            if csize != usize:
                raise ValueError("zip: stored size mismatch")
            data = blob
        elif method == 8:
            d = zlib.decompressobj(-15)
            data = d.decompress(blob) + d.flush()
        else:
            raise ValueError(f"zip: compression method {method} "
                             "out of scope")
        if len(data) != usize:
            raise ValueError("zip: inflated size mismatch")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError("zip: CRC-32 mismatch")
        out.append((name, method, data))
    return out


def list_zip_members(assets: DataFrame) -> DataFrame:
    """ZIP → one row per member (name, ``stored``/``deflate``,
    uncompressed size, CRC verdict — ``crc_ok`` is definitionally
    true for emitted rows since a mismatch poisons the whole
    archive). Poison yields the single null row ``member_idx -1``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "asset_id", "member_idx", "member_name", "method",
            "n_bytes", "crc_ok",
        ]
        for pdf in it:
            rows = []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    for i, (name, method, data) in enumerate(
                        _zip_members(bytes(b))
                    ):
                        rows.append((
                            int(aid), i, name,
                            "stored" if method == 0 else "deflate",
                            len(data), True,
                        ))
                except (ValueError, struct.error, zlib.error):
                    rows.append((int(aid), -1, None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(batches, ZIP_MEMBER_SCHEMA)


_P_RE = re.compile(rb"<w:p(?:\s[^>]*)?>(.*?)</w:p>", re.S)
_T_RE = re.compile(
    rb"<w:(t)(?:\s[^>]*)?>(.*?)</w:t>|<w:(tab)\s*/>|<w:(br)\s*/>",
    re.S,
)
_ENTS = (
    (b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
    (b"&apos;", b"'"), (b"&amp;", b"&"),  # &amp; LAST
)


def _docx_text(raw: bytes) -> tuple:
    """word/document.xml → (text, n_paragraphs): per ``<w:p>`` block
    concatenate ``<w:t>`` run contents (+ TAB/newline for
    ``<w:tab/>``/``<w:br/>``), decode entities, join paragraphs with
    newlines."""
    doc = None
    for name, _method, data in _zip_members(raw):
        if name == "word/document.xml":
            doc = data
            break
    if doc is None:
        raise ValueError("docx: no word/document.xml member")
    paras = []
    for m in _P_RE.finditer(doc):
        parts = []
        for t in _T_RE.finditer(m.group(1)):
            if t.group(1):
                s = t.group(2)
                for ent, ch in _ENTS:
                    s = s.replace(ent, ch)
                parts.append(s)
            elif t.group(3):
                parts.append(b"\t")
            else:
                parts.append(b"\n")
        paras.append(b"".join(parts))
    if not paras:
        raise ValueError("docx: no paragraphs")
    return b"\n".join(paras).decode("utf-8"), len(paras)


def extract_docx_text(assets: DataFrame) -> DataFrame:
    """DOCX → (text, n_paragraphs, n_chars), one row per asset;
    poison (bad zip framing, missing document part, no paragraphs)
    → null row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "text", "n_paragraphs", "n_chars"]
        for pdf in it:
            rows = []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    text, n_p = _docx_text(bytes(b))
                    rows.append((int(aid), text, n_p, len(text)))
                except (ValueError, struct.error, zlib.error):
                    rows.append((int(aid), None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(batches, DOCX_TEXT_SCHEMA)


# ----------------------------------------------------------------- synth


def _dos_epoch() -> tuple:
    # DOS date 1980-01-01, time 00:00:00 — fixed so archives are
    # byte-deterministic.
    return 0, (1 << 5) | 1


def _zip_bytes(members: list) -> bytes:
    """Hand-rolled ZIP writer (APPNOTE layout): ``members`` is
    ``[(name, data, method), …]``; deterministic (fixed DOS
    timestamps, no extra fields). The PARSER is interop-pinned
    against stdlib ``zipfile`` archives in pytest, so writer and
    walker cannot share a hidden layout bug."""
    t, d = _dos_epoch()
    locals_, centrals = [], []
    offset = 0
    for name, data, method in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            blob = co.compress(data) + co.flush()
        else:
            blob = data
        lfh = (
            _LFH_SIG
            + struct.pack(
                "<HHHHHIIIHH", 20, 0, method, t, d, crc,
                len(blob), len(data), len(nb), 0,
            )
            + nb
        )
        centrals.append(
            _CDE_SIG
            + struct.pack(
                "<HHHHHHIIIHHHHHII", 20, 20, 0, method, t, d, crc,
                len(blob), len(data), len(nb), 0, 0, 0, 0, 0, offset,
            )
            + nb
        )
        locals_.append(lfh + blob)
        offset += len(lfh) + len(blob)
    cd = b"".join(centrals)
    eocd = _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(cd),
        offset, 0,
    )
    return b"".join(locals_) + cd + eocd


def synth_zip_assets(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """One ZIP per row: a STORED text member, a DEFLATED binary
    member in a subdirectory, and a DEFLATED text member — names,
    contents, and sizes all closed forms of ``asset_id``."""

    def one(aid: int) -> bytes:
        return _zip_bytes([
            ("a.txt", (f"alpha {aid} " * (1 + aid % 3)).encode(), 0),
            ("dir/b.bin", (f"b{aid}!" * (2 + aid % 4)).encode(), 8),
            ("c.txt", f"gamma {aid}".encode(), 8),
        ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf[id_col],
                "payload": [one(int(a)) for a in pdf[id_col]],
                "media_type": "application/zip",
            })

    return df.mapInPandas(batches, ASSET_SCHEMA)


_DOCX_CONTENT_TYPES = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    b'content-types"><Default Extension="xml" ContentType="applicati'
    b'on/xml"/><Override PartName="/word/document.xml" ContentType='
    b'"application/vnd.openxmlformats-officedocument.wordprocessingm'
    b'l.document.main+xml"/></Types>'
)


def synth_docx_assets(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """One DOCX per row: ``2 + aid % 3`` paragraphs; paragraph ``p``
    renders as two ``<w:t>`` runs ``'para {p} d{aid}'`` + ``' t{p}
    &<'`` (the tail via XML entities, split across runs so run
    re-joining is proven), with a ``<w:tab/>`` between the runs of
    even paragraphs and a ``<w:br/>`` in odd ones."""

    def one(aid: int) -> bytes:
        paras = []
        for p in range(2 + aid % 3):
            sep = b"<w:tab/>" if p % 2 == 0 else b"<w:br/>"
            paras.append(
                b'<w:p><w:r><w:t xml:space="preserve">'
                + f"para {p} d{aid}".encode()
                + b"</w:t></w:r><w:r>" + sep
                + b'<w:t xml:space="preserve">'
                + f"t{p} &amp;&lt;".encode()
                + b"</w:t></w:r></w:p>"
            )
        doc = (
            b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            b'<w:document xmlns:w="http://schemas.openxmlformats.org/'
            b'wordprocessingml/2006/main"><w:body>'
            + b"".join(paras)
            + b"</w:body></w:document>"
        )
        return _zip_bytes([
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES, 8),
            ("word/document.xml", doc, 8),
        ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf[id_col],
                "payload": [one(int(a)) for a in pdf[id_col]],
                "media_type": "application/vnd.openxmlformats-office"
                              "document.wordprocessingml.document",
            })

    return df.mapInPandas(batches, ASSET_SCHEMA)


# --------------------------------------------------------------- EPUB

EPUB_TEXT_SCHEMA = (
    "asset_id long, spine_idx int, href string, text string, "
    "n_chars long"
)

_ROOTFILE_RE = re.compile(rb'<rootfile[^>]*full-path="([^"]+)"')
_ITEM_RE = re.compile(
    rb'<item(?:\s[^>]*?)?\sid="([^"]+)"[^>]*?\shref="([^"]+)"'
)
_ITEMREF_RE = re.compile(rb'<itemref(?:\s[^>]*?)?\sidref="([^"]+)"')
_DROP_RE = re.compile(
    rb"(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"\s+")


def _epub_chapters(raw: bytes) -> list:
    """EPUB (OCF + OPF, the IDPF/W3C packaging specs): container.xml
    names the OPF rootfile; the OPF ``<manifest>`` maps ids to hrefs
    and ``<spine>`` fixes READING ORDER (which need not match zip
    member order — the walk follows the spine). Each spine document
    is XHTML, reduced to text by the same drop-script/style → strip
    tags → decode entities → collapse whitespace pipeline as the JVM
    ``strip_html``. Returns ``[(spine_idx, href, text), …]``."""
    members = {n: d for n, _m, d in _zip_members(raw)}
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ValueError("epub: no META-INF/container.xml")
    m = _ROOTFILE_RE.search(container)
    if not m:
        raise ValueError("epub: no rootfile in container.xml")
    opf_path = m.group(1).decode("utf-8")
    opf = members.get(opf_path)
    if opf is None:
        raise ValueError("epub: missing OPF rootfile")
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    items = {i: h for i, h in _ITEM_RE.findall(opf)}
    out = []
    for idx, ref in enumerate(_ITEMREF_RE.findall(opf)):
        href_b = items.get(ref)
        if href_b is None:
            raise ValueError("epub: spine idref not in manifest")
        href = href_b.decode("utf-8")
        doc = members.get(base + href)
        if doc is None:
            raise ValueError("epub: missing spine document")
        t = _DROP_RE.sub(b"", doc)
        t = _TAG_RE.sub(b"", t)
        for ent, ch in _ENTS:
            t = t.replace(ent, ch)
        t = _WS_RE.sub(b" ", t).strip()
        out.append((idx, href, t.decode("utf-8")))
    if not out:
        raise ValueError("epub: empty spine")
    return out


def extract_epub_text(assets: DataFrame) -> DataFrame:
    """EPUB → one row per SPINE document in reading order
    (spine_idx, href, text, n_chars); poison (bad zip, missing
    container/OPF/spine doc, dangling idref) → null row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "spine_idx", "href", "text", "n_chars"]
        for pdf in it:
            rows = []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    for idx, href, text in _epub_chapters(bytes(b)):
                        rows.append(
                            (int(aid), idx, href, text, len(text))
                        )
                except (ValueError, struct.error, zlib.error):
                    rows.append((int(aid), -1, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(batches, EPUB_TEXT_SCHEMA)


_CONTAINER_XML = (
    b'<?xml version="1.0"?><container version="1.0" xmlns="urn:oasis'
    b':names:tc:opendocument:xmlns:container"><rootfiles><rootfile '
    b'full-path="OEBPS/content.opf" media-type="application/oebps-'
    b'package+xml"/></rootfiles></container>'
)


def synth_epub_assets(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """One EPUB per row: ``2 + aid % 2`` XHTML chapters whose text is
    a closed form of (asset_id, chapter). Chapter FILES are stored in
    the zip in REVERSE order while the spine lists reading order, so
    a walker that trusts member order fails; the ``mimetype`` member
    is stored uncompressed first, per OCF."""

    def one(aid: int) -> bytes:
        n = 2 + aid % 2
        chapters = []
        for i in range(n):
            xhtml = (
                b"<html>\n<head><title>c%d</title></head>\n<body>\n"
                b"<h1>Chapter %d</h1>\n<p>body d%d s%d &amp; more</p>"
                b"\n<script>junk()</script>\n</body>\n</html>"
                % (i, i, aid, i)
            )
            chapters.append((f"OEBPS/ch{i}.xhtml", xhtml, 8))
        manifest = b"".join(
            b'<item id="c%d" href="ch%d.xhtml" media-type="applicatio'
            b'n/xhtml+xml"/>' % (i, i)
            for i in range(n)
        )
        spine = b"".join(
            b'<itemref idref="c%d"/>' % i for i in range(n)
        )
        opf = (
            b'<?xml version="1.0"?><package xmlns="http://www.idpf.'
            b'org/2007/opf" version="3.0"><manifest>' + manifest
            + b"</manifest><spine>" + spine + b"</spine></package>"
        )
        return _zip_bytes(
            [("mimetype", b"application/epub+zip", 0),
             ("META-INF/container.xml", _CONTAINER_XML, 8),
             ("OEBPS/content.opf", opf, 8)]
            + chapters[::-1]
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf[id_col],
                "payload": [one(int(a)) for a in pdf[id_col]],
                "media_type": "application/epub+zip",
            })

    return df.mapInPandas(batches, ASSET_SCHEMA)
