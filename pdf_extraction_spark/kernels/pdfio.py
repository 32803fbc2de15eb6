"""Minimal PDF writer + byte-stream text extractor (S3/S4).

The container ships no PDF library, so the engine carries a deterministic
pure-Python pair:

- :func:`build_minimal_pdf` emits an uncompressed PDF 1.4 with one
  content stream per page (``BT``/``Tj``/``T*``/``ET`` text operators,
  literal strings) — used by the synthetic pages generator.
- :func:`extract_pdf_text` parses the byte stream (object graph →
  /Catalog → /Pages → /Kids order → /Contents) and reassembles page text.

Per-page/page-join semantics mirror the reference extractor
(pdf-parser/extractor/pdf_extractor.py:4-28): each non-empty page
contributes ``page_text + "\n"``. When pdfplumber / PyPDF2 are importable
they are preferred for real-world PDFs (same fallback order as the
reference); the built-in parser handles the engine's own subset and any
uncompressed Tj/TJ-based PDF.
"""

import io
import re

try:  # optional, matches reference library order (pdf_extractor.py:1-2)
    import pdfplumber  # type: ignore
except ImportError:
    pdfplumber = None
try:
    import PyPDF2  # type: ignore
except ImportError:
    PyPDF2 = None


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_minimal_pdf(pages, compress: bool = False) -> bytes:
    """Build a single-font PDF; ``pages`` is a list of page strings whose
    lines become ``Tj`` runs separated by ``T*``. Text is Latin-1-
    projected (lossy for exotic chars) — the synthetic corpus keeps PDF
    payloads ASCII-safe. ``compress`` FlateDecodes content streams (the
    real-world layout)."""
    objects = []  # list of bytes, object number = index + 1

    n_pages = len(pages)
    # 1: catalog, 2: pages, 3: font, then per page: page obj, content obj
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode("ascii")
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    for i, page_text in enumerate(pages):
        content_num = 5 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode("ascii")
        )
        lines = page_text.split("\n")
        ops = ["BT", "/F1 11 Tf", "12 TL", "1 780 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append("T*")
            ops.append(f"({_escape_pdf_string(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", errors="replace")
        if compress:
            import zlib

            stream = zlib.compress(stream)
            objects.append(
                b"<< /Length " + str(len(stream)).encode("ascii")
                + b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream"
            )
        else:
            objects.append(
                b"<< /Length " + str(len(stream)).encode("ascii") + b" >>\nstream\n"
                + stream + b"\nendstream"
            )

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(out.tell())
        out.write(f"{num} 0 obj\n".encode("ascii"))
        out.write(body)
        out.write(b"\nendobj\n")
    xref_pos = out.tell()
    out.write(f"xref\n0 {len(objects) + 1}\n".encode("ascii"))
    out.write(b"0000000000 65535 f \n")
    for off in offsets[1:]:
        out.write(f"{off:010d} 00000 n \n".encode("ascii"))
    out.write(
        (
            f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n"
        ).encode("ascii")
    )
    return out.getvalue()


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# literal or hex string followed by a text-showing operator; positioning
# ops (incl. Tm — word-processor exports emit one Tm per line where
# hand-built files use Td) break lines
_SHOW_RE = re.compile(
    rb"\(((?:\\.|[^\\()])*)\)\s*(Tj|')"
    rb"|<([0-9A-Fa-f\s]*)>\s*(Tj|')"
    rb"|\[(.*?)\]\s*TJ"
    rb"|(T\*|Td|TD|Tm)"
)
_TJ_ITEM_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)|<([0-9A-Fa-f\s]*)>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> str:
    if b"\\" not in raw:  # overwhelmingly common fast path
        return raw.decode("latin-1")
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal escape, up to 3 octal digits
                # PDF 32000-1 §7.3.4.2: only 0-7 participate; \8 and \9 are
                # NOT octal (int(b"9", 8) would raise) — handled below by
                # dropping the backslash and keeping the character.
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j] in b"01234567":
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            # unknown escape (incl. \8, \9): drop backslash, keep char
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _decode_hex(raw: bytes) -> str:
    """PDF hex string <...>: whitespace ignored, odd length padded with
    0 (spec 7.3.4.3); single-byte (Latin-1) assumption — multi-byte CID
    font encodings are out of scope for the builtin fallback."""
    hx = b"".join(raw.split())
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1")
    except ValueError:
        return ""


def _stream_text(stream: bytes) -> str:
    """Text of one content stream: Tj/'/TJ runs (literal or hex
    strings), T*/Td/TD/Tm as line breaks."""
    lines = []
    for block in _TEXT_BLOCK_RE.findall(stream):
        current = []
        for m in _SHOW_RE.finditer(block):
            lit, lit_op, hx, hx_op, tj, pos_op = m.groups()
            if pos_op:  # positioning op → new line
                if current:
                    lines.append("".join(current))
                    current = []
            elif tj is not None:  # TJ array (kerning numbers skipped)
                for im in _TJ_ITEM_RE.finditer(tj):
                    if im.group(1) is not None:
                        current.append(_decode_literal(im.group(1)))
                    else:
                        current.append(_decode_hex(im.group(2)))
            elif lit is not None or hx is not None:
                if (lit_op or hx_op) == b"'":  # ' implies T* first
                    if current:
                        lines.append("".join(current))
                        current = []
                current.append(
                    _decode_literal(lit) if lit is not None else _decode_hex(hx)
                )
        if current:
            lines.append("".join(current))
    return "\n".join(lines)


def _builtin_extract(data: bytes) -> str:
    objects = {int(num): body for num, body in _OBJ_RE.findall(data)}

    def walk_pages(num, seen):
        """Page-tree walk: intermediate /Pages nodes recurse into /Kids
        (real generators nest the tree), leaf /Page nodes are yielded in
        tree order."""
        if num in seen or num not in objects:
            return
        seen.add(num)
        body = objects[num]
        kids = re.search(rb"/Kids\s*\[(.*?)\]", body, re.DOTALL)
        if kids:
            for kid in _REF_RE.findall(kids.group(1)):
                yield from walk_pages(int(kid), seen)
        elif b"/Type /Page" in body or b"/Type/Page" in body:
            yield num

    def content_refs(body):
        """/Contents: single ref or an array of refs (generators split
        page content across multiple streams)."""
        m = re.search(rb"/Contents\s*\[(.*?)\]", body, re.DOTALL)
        if m:
            return [int(n) for n in _REF_RE.findall(m.group(1))]
        m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        return [int(m.group(1))] if m else []

    def stream_of(content):
        ms = re.search(rb"stream\r?\n", content)
        if ms is None:
            return None
        start = ms.end()
        head = content[: ms.start()]
        # /Length gives the exact byte count — authoritative over
        # scanning for 'endstream', which can occur inside compressed
        # bytes; an indirect /Length (N 0 R — the common generator
        # shape, length written after the stream) is resolved first
        ml_ind = re.search(rb"/Length\s+(\d+)\s+\d+\s+R", head)
        stream = None
        if ml_ind:
            # indirect /Length: resolve ONLY via the referenced object —
            # falling through to the direct-form pattern would misread
            # the ref's object number as a byte count and slice garbage;
            # an unresolvable ref goes straight to the endstream scan
            if int(ml_ind.group(1)) in objects:
                ref_body = objects[int(ml_ind.group(1))].strip()
                if ref_body.isdigit():
                    stream = content[start : start + int(ref_body)]
        else:
            ml = re.search(rb"/Length\s+(\d+)", head)
            if ml:
                stream = content[start : start + int(ml.group(1))]
        if stream is None:
            sm = _STREAM_RE.search(content)
            if not sm:
                return None
            stream = sm.group(1)
        if b"/FlateDecode" in head:
            import zlib

            try:
                stream = zlib.decompress(stream)
            except zlib.error:
                return None
        return stream

    def page_streams_in_order():
        # catalog → /Pages tree gives the authoritative page order;
        # fall back to document-order /Page objects for odd files.
        order = []
        for num in sorted(objects):
            body = objects[num]
            if b"/Type /Catalog" in body or b"/Type/Catalog" in body:
                m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", body)
                if m:
                    order = list(walk_pages(int(m.group(1)), set()))
                break
        if not order:
            order = [
                num
                for num in sorted(objects)
                if b"/Type /Page" in objects[num] or b"/Type/Page" in objects[num]
            ]
        for num in order:
            body = objects.get(num, b"")
            parts = [
                s
                for s in (stream_of(objects.get(ref, b"")) for ref in content_refs(body))
                if s is not None
            ]
            if parts:
                # spec 7.8.2: multiple /Contents streams form ONE logical
                # stream with whitespace between — operators may not span
                # parts but text runs do
                yield b"\n".join(parts)

    text = ""
    for stream in page_streams_in_order():
        page_text = _stream_text(stream)
        if page_text:
            text += page_text + "\n"
    return text


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → text; pdfplumber → PyPDF2 → built-in parser, first
    non-empty wins (fallback order per reference pdf_extractor.py:8-26)."""
    if pdfplumber is not None:
        try:
            text = ""
            with pdfplumber.open(io.BytesIO(data)) as pdf:
                for page in pdf.pages:
                    page_text = page.extract_text()
                    if page_text:
                        text += page_text + "\n"
            if text.strip():
                return text
        except Exception:
            pass
    if PyPDF2 is not None:
        try:
            text = ""
            reader = PyPDF2.PdfReader(io.BytesIO(data))
            for page in reader.pages:
                text += page.extract_text() + "\n"
            if text.strip():
                return text
        except Exception:
            pass
    return _builtin_extract(data)
