"""PDF text extraction — the document-to-text step of an LLM corpus.

A huge share of high-quality training text lives in PDF, and the
extract step is structurally unlike HTML stripping: the file is a
random-access object graph (cross-reference table → catalog → page
tree → per-page content streams), the payload is usually
Flate-compressed, and the text is not a character stream but a
sequence of POSITIONED show operators inside ``BT``/``ET`` blocks.
This module implements the real pipeline for classic (non-encrypted,
xref-table) PDFs from first principles, spec-cited to the public
PDF 1.7 reference (ISO 32000-1):

- §7.5.4 cross-reference table + trailer (``startxref`` tail scan,
  20-byte entries, ``/Root``);
- §7.3 object syntax — dictionaries, arrays, names, numbers,
  literal strings with all escapes (``\\(`` ``\\)`` ``\\\\`` octal,
  line continuations), hex strings, indirect references;
- §7.4.4 FlateDecode via stdlib zlib;
- §7.7.3 the page tree (nested ``/Kids``, ``/Contents`` as a single
  stream or an array of parts);
- §9.4 text operators: ``Tj``/``'``/``\"`` show, ``TJ`` with
  kerning (a displacement ≤ -100 thousandths of an em renders as a
  word gap — the standard extractor heuristic), ``Td``/``TD``/
  ``T*``/``Tm`` line moves.

Spark-first: one PDF is one binary asset row; extraction is an Arrow
``mapInPandas`` one-to-many expansion (asset → pages), so payloads
never shuffle and a malformed file nulls one row, never the stage.
Bytes map to text latin-1 (the WinAnsi-compatible core for the
synthesized ASCII range); CID/Type0 font decoding is out of scope
and documented as such.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .multimodal import ASSET_SCHEMA

PDF_TEXT_SCHEMA = (
    "asset_id long, page_idx int, text string, n_chars long"
)

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


class _PdfLexer:
    """Minimal object-syntax reader over one byte buffer."""

    def __init__(self, buf: bytes, at: int = 0):
        self.buf = buf
        self.at = at

    def _skip_ws(self):
        buf, at = self.buf, self.at
        while at < len(buf):
            c = buf[at : at + 1]
            if c in (b"%",):  # comment to EOL (§7.2.4)
                eol = buf.find(b"\n", at)
                at = len(buf) if eol < 0 else eol + 1
            elif c in _WS:
                at += 1
            else:
                break
        self.at = at

    def value(self):
        """Parse one object value at the cursor."""
        self._skip_ws()
        buf, at = self.buf, self.at
        if at >= len(buf):
            raise ValueError("pdf: unexpected EOF")
        c = buf[at : at + 1]
        if buf[at : at + 2] == b"<<":
            return self._dict()
        if c == b"<":
            return self._hex_string()
        if c == b"(":
            return self._lit_string()
        if c == b"[":
            return self._array()
        if c == b"/":
            return self._name()
        if c in b"+-.0123456789":
            return self._number_or_ref()
        m = re.match(rb"(true|false|null)", buf[at:])
        if m:
            self.at = at + len(m.group(1))
            return {b"true": True, b"false": False, b"null": None}[
                m.group(1)
            ]
        raise ValueError("pdf: bad token")

    def _name(self):
        buf, at = self.buf, self.at + 1
        start = at
        while at < len(buf) and buf[at : at + 1] not in _WS \
                and buf[at : at + 1] not in _DELIM:
            at += 1
        self.at = at
        # §7.3.5 #xx escapes
        raw = buf[start:at]
        out = re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda m: bytes([int(m.group(1), 16)]),
            raw,
        )
        return "/" + out.decode("latin-1")

    def _number_or_ref(self):
        buf, at = self.buf, self.at
        m = re.match(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", buf[at:])
        if not m:
            raise ValueError("pdf: bad number")
        tok = m.group(0)
        self.at = at + len(tok)
        if b"." in tok:
            return float(tok)
        # lookahead for "G R" → indirect reference (§7.3.10)
        save = self.at
        self._skip_ws()
        m2 = re.match(rb"(\d+)[\x00\t\n\x0c\r ]+R(?![A-Za-z])",
                      buf[self.at :])
        if m2:
            self.at += len(m2.group(0))
            return _Ref(int(tok))
        self.at = save
        return int(tok)

    def _array(self):
        self.at += 1
        out = []
        while True:
            self._skip_ws()
            if self.buf[self.at : self.at + 1] == b"]":
                self.at += 1
                return out
            out.append(self.value())

    def _dict(self):
        self.at += 2
        out = {}
        while True:
            self._skip_ws()
            if self.buf[self.at : self.at + 2] == b">>":
                self.at += 2
                return out
            key = self.value()
            if not isinstance(key, str) or not key.startswith("/"):
                raise ValueError("pdf: dict key must be a name")
            out[key] = self.value()

    def _hex_string(self):
        end = self.buf.find(b">", self.at)
        if end < 0:
            raise ValueError("pdf: unterminated hex string")
        hx = re.sub(rb"[\x00\t\n\x0c\r ]", b"", self.buf[self.at + 1 : end])
        self.at = end + 1
        if len(hx) % 2:
            hx += b"0"  # §7.3.4.3 odd final digit
        return bytes.fromhex(hx.decode("ascii"))

    def _lit_string(self):
        buf, at = self.buf, self.at + 1
        out = bytearray()
        depth = 1
        esc = {
            b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
            b"(": 40, b")": 41, b"\\": 92,
        }
        while at < len(buf):
            c = buf[at : at + 1]
            if c == b"\\":
                nxt = buf[at + 1 : at + 2]
                if nxt in esc:
                    out.append(esc[nxt])
                    at += 2
                elif nxt and nxt in b"01234567":
                    # §7.3.4.2 octal escape: digits 8/9 are NOT
                    # octal — ``\8`` drops the backslash and keeps
                    # the '8' (else-branch below), it never matches
                    # here (r15 ADVICE low item: ``nxt.isdigit()``
                    # accepted 8/9 and then crashed on a None match)
                    m = re.match(rb"[0-7]{1,3}", buf[at + 1 :])
                    out.append(int(m.group(0), 8) & 0xFF)
                    at += 1 + len(m.group(0))
                elif nxt in (b"\n", b"\r"):  # line continuation
                    at += 2
                    if nxt == b"\r" and buf[at : at + 1] == b"\n":
                        at += 1
                else:
                    at += 1  # §7.3.4.2: lone backslash is dropped
            elif c == b"(":
                depth += 1
                out.append(40)
                at += 1
            elif c == b")":
                depth -= 1
                if depth == 0:
                    self.at = at + 1
                    return bytes(out)
                out.append(41)
                at += 1
            else:
                out.append(c[0])
                at += 1
        raise ValueError("pdf: unterminated string")


class _PdfFile:
    def __init__(self, raw: bytes):
        if not raw.startswith(b"%PDF-"):
            raise ValueError("pdf: missing %PDF header")
        self.raw = raw
        self.offsets = {}
        self.trailer = self._read_xref()
        self._cache = {}

    def _read_xref(self):
        tail = self.raw[-256:]
        m = re.search(rb"startxref[\x0d\x0a\s]+(\d+)", tail)
        if not m:
            raise ValueError("pdf: no startxref")
        at = int(m.group(1))
        if self.raw[at : at + 4] != b"xref":
            raise ValueError("pdf: xref streams unsupported (classic "
                             "table expected)")
        lx = _PdfLexer(self.raw, at + 4)
        while True:
            lx._skip_ws()
            if self.raw[lx.at : lx.at + 7] == b"trailer":
                lx.at += 7
                return lx.value()
            m = re.match(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)",
                         self.raw[lx.at :])
            if not m:
                raise ValueError("pdf: bad xref subsection")
            first, count = int(m.group(1)), int(m.group(2))
            lx.at += len(m.group(0))
            lx._skip_ws()
            for i in range(count):
                ent = self.raw[lx.at : lx.at + 20]
                if len(ent) < 18:
                    raise ValueError("pdf: truncated xref entry")
                off, _gen, kind = ent[:10], ent[11:16], ent[17:18]
                if kind == b"n":
                    self.offsets[first + i] = int(off)
                lx.at += 20 if len(ent) == 20 and ent[18:20] in (
                    b"\r\n", b" \n", b" \r") else 20

    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.get(v.num)[0]
        return v

    def get(self, num: int):
        """→ (value, stream_bytes_or_None), decoded per /Filter."""
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None or off >= len(self.raw):
            raise ValueError("pdf: object missing from xref")
        m = re.match(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)"
                     rb"[\x00\t\n\x0c\r ]+obj", self.raw[off:])
        if not m or int(m.group(1)) != num:
            raise ValueError("pdf: object header mismatch")
        lx = _PdfLexer(self.raw, off + len(m.group(0)))
        val = lx.value()
        lx._skip_ws()
        stream = None
        if self.raw[lx.at : lx.at + 6] == b"stream":
            at = lx.at + 6
            if self.raw[at : at + 2] == b"\r\n":
                at += 2
            elif self.raw[at : at + 1] == b"\n":
                at += 1
            ln = self.resolve(val.get("/Length"))
            if not isinstance(ln, int) or at + ln > len(self.raw):
                raise ValueError("pdf: bad stream /Length")
            stream = self.raw[at : at + ln]
            filt = self.resolve(val.get("/Filter"))
            if filt == "/FlateDecode":
                stream = zlib.decompress(stream)
            elif filt is not None:
                raise ValueError(f"pdf: unsupported filter {filt}")
        self._cache[num] = (val, stream)
        return self._cache[num]

    def pages(self):
        root = self.resolve(self.trailer.get("/Root"))
        tree = self.resolve(root.get("/Pages"))
        out = []

        def walk(node):
            if self.resolve(node.get("/Type")) == "/Pages":
                for kid in self.resolve(node.get("/Kids")):
                    walk(self.resolve(kid))
            else:
                out.append(node)

        walk(tree)
        return out

    def page_content(self, page) -> bytes:
        contents = page.get("/Contents")
        if isinstance(contents, _Ref):
            # may be one stream or an array object of stream refs
            val, stream = self.get(contents.num)
            if stream is not None:
                return stream
            contents = val
        parts = contents if isinstance(contents, list) else [contents]
        blobs = []
        for p in parts:
            num = p.num if isinstance(p, _Ref) else None
            if num is None:
                raise ValueError("pdf: /Contents must be references")
            _, stream = self.get(num)
            if stream is None:
                raise ValueError("pdf: content object has no stream")
            blobs.append(stream)
        return b"\n".join(blobs)


def _extract_page_text(content: bytes) -> str:
    """Replay the §9.4 text operators of one content stream: operands
    are pushed with the object lexer; ``Tj``/``'``/``\"`` show their
    string, ``TJ`` shows its array with a space for any kerning
    displacement ≤ -100, and ``Td``/``TD``/``T*``/``Tm`` start a new
    line. Graphics operators are consumed and ignored."""
    lx = _PdfLexer(content)
    stack = []
    parts = []

    def newline():
        if parts and not parts[-1].endswith("\n"):
            parts.append("\n")

    def show(b: bytes):
        parts.append(b.decode("latin-1"))

    while True:
        lx._skip_ws()
        if lx.at >= len(content):
            break
        c = content[lx.at : lx.at + 1]
        if c in b"+-.0123456789([</":
            stack.append(lx.value())
            continue
        m = re.match(rb"[A-Za-z'\"*]{1,3}", content[lx.at :])
        if not m:
            raise ValueError("pdf: bad content token")
        op = m.group(0)
        lx.at += len(op)
        if op == b"Tj" and stack:
            show(stack[-1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    show(el)
                elif isinstance(el, (int, float)) and el <= -100:
                    parts.append(" ")
        elif op == b"'" and stack:
            newline()
            show(stack[-1])
        elif op == b'"' and stack:
            newline()
            show(stack[-1])
        elif op in (b"Td", b"TD", b"T*", b"Tm"):
            newline()
        stack = [] if op not in (b"BT", b"ET") else stack
    return "".join(parts)


def extract_pdf_text(assets: DataFrame) -> DataFrame:
    """PDF → one row per page (Arrow ``mapInPandas`` one-to-many):
    cross-reference walk, page-tree flatten, FlateDecode, text-show
    replay. Poison (bad header, broken xref, bad /Length, corrupt
    Flate data, unsupported filter) yields the single null row
    ``page_idx -1`` — a 100 TB document sweep must survive any
    single file."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    f = _PdfFile(bytes(b))
                    for i, page in enumerate(f.pages()):
                        txt = _extract_page_text(f.page_content(page))
                        rows.append((int(aid), i, txt, len(txt)))
                except Exception:
                    rows.append((int(aid), -1, None, None))
            yield pd.DataFrame(
                rows, columns=["asset_id", "page_idx", "text", "n_chars"]
            )

    return assets.mapInPandas(batches, PDF_TEXT_SCHEMA)


def synth_pdf_assets(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Synthesize classic-xref PDFs whose extracted text is a closed
    form of ``asset_id``: ``1 + aid % 3`` pages; page ``p`` shows
    one literal string exercising escapes (``\\(`` ``\\)`` and octal
    ``\\056`` = '.') via ``Tj``, then a ``TJ`` array mixing a literal,
    a -250 kerning gap, and a HEX string — so extracted page text is
    ``'Doc (aid) page p.' + NL + 'segAID endP'``. Even assets
    Flate-compress every content stream (aid parity cycles the
    filter path); the xref offsets are computed, not templated."""

    def one(aid: int) -> bytes:
        n_pages = 1 + aid % 3
        objs = {}
        page_nums = [3 + 2 * p for p in range(n_pages)]
        kids = " ".join(f"{n} 0 R" for n in page_nums)
        objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
        objs[2] = (
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
        ).encode("ascii")
        font_num = 3 + 2 * n_pages
        for p in range(n_pages):
            hexseg = f"end{p}".encode("latin-1").hex()
            content = (
                f"BT /F1 12 Tf 72 720 Td "
                f"(Doc \\({aid}\\) page {p}\\056) Tj "
                f"0 -14 Td [(seg{aid}) -250 <{hexseg}>] TJ ET"
            ).encode("ascii")
            flate = aid % 2 == 0
            data = zlib.compress(content, 9) if flate else content
            filt = b" /Filter /FlateDecode" if flate else b""
            objs[3 + 2 * p] = (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {4 + 2 * p} 0 R >>"
            ).encode("ascii")
            objs[4 + 2 * p] = (
                b"<< /Length " + str(len(data)).encode("ascii") + filt
                + b" >>\nstream\n" + data + b"\nendstream"
            )
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
        out = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n")
        offsets = {}
        for num in sorted(objs):
            offsets[num] = len(out)
            out += (
                f"{num} 0 obj\n".encode("ascii") + objs[num]
                + b"\nendobj\n"
            )
        xref_at = len(out)
        n = max(objs) + 1
        out += f"xref\n0 {n}\n".encode("ascii")
        out += b"0000000000 65535 f \n"
        for num in range(1, n):
            out += f"{offsets[num]:010d} 00000 n \n".encode("ascii")
        out += (
            f"trailer\n<< /Size {n} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode("ascii")
        return bytes(out)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "payload": [one(int(a)) for a in pdf[id_col]],
                    "media_type": "application/pdf",
                }
            )

    return df.mapInPandas(batches, ASSET_SCHEMA)
