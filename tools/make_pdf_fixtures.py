"""Generate the committed deterministic PDF fixtures under
tests/fixtures/pdfs/.

Each fixture is a minimal single-page PDF with a /FlateDecode content
stream exercising one corner of the text model the extractor supports
(sources/readers.py::_extract_pdf_fallback — reference parity with
/root/reference/nlp_data_tagging.py:37-47):

  fixture_alpha.pdf   plain Tj literal string
  fixture_bravo.pdf   backslash escapes: \\( \\) and octal \\045 ('%')
  fixture_charlie.pdf TJ array form (kerned segments concatenated)

The OUTPUT BYTES are committed; reruns of this script only matter when
changing the fixture set. Offsets in the xref table are computed, so
the files are also valid for real readers (pypdf), not just the
fallback parser.
"""

from __future__ import annotations

import os
import zlib

FIXTURES = {
    # name -> (content-stream bytes, expected extracted text)
    "fixture_alpha.pdf": (
        b"BT /F1 12 Tf 72 720 Td (Spark reads fixture alpha.) Tj ET",
        "Spark reads fixture alpha.",
    ),
    "fixture_bravo.pdf": (
        b"BT /F1 12 Tf 72 720 Td "
        b"(Bravo \\(escaped\\) text: 100\\045 parsed.) Tj ET",
        "Bravo (escaped) text: 100% parsed.",
    ),
    "fixture_charlie.pdf": (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Charlie ) (delta ) (fixture.)] TJ ET",
        "Charlie delta fixture.",
    ),
}


def build_pdf(content_stream: bytes) -> bytes:
    compressed = zlib.compress(content_stream, 9)
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(compressed), compressed),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "..", "tests", "fixtures", "pdfs")
    os.makedirs(outdir, exist_ok=True)
    for name, (stream, expected) in FIXTURES.items():
        path = os.path.join(outdir, name)
        with open(path, "wb") as fh:
            fh.write(build_pdf(stream))
        print(f"{name}: {os.path.getsize(path)} bytes, expect {expected!r}")


if __name__ == "__main__":
    main()
