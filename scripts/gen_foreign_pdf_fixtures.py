"""Generate FOREIGN-layout PDF byte fixtures (tests/data/pdf_foreign/)
— r4 VERDICT task #2: parse_pdf's oracle corpus was previously
round-tripped through the repo's own make_pdf; these fixtures pin
cross-generator layouts make_pdf never emits:

- f1_xref_objstm.pdf  — PDF-1.6 "modern writer" shape: catalog /
  pages / page dicts / Info packed in a Flate /ObjStm, a /Type /XRef
  cross-reference STREAM (W [1 2 1], type-2 entries for the packed
  objects) instead of a `trailer` keyword, binary marker comment,
  \r\n EOLs, two fonts with mid-line Tf switches, TJ kerning arrays,
  hex strings.
- f2_contents_array.pdf — classic trailer but /Contents is an ARRAY
  of two raw streams (spec: concatenated), %-comments inside content,
  tab/\r whitespace, octal escapes, a nested-paren literal.
- f3_incremental.pdf  — an incremental update APPENDS a redefined
  page-1 content stream and a second trailer with /Prev; the later
  definition must win.

Deterministic bytes; regenerate only if the declared subset grows.
"""

import os
import zlib

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "data",
    "pdf_foreign",
)


def f1_xref_objstm() -> bytes:
    # --- packed (ObjStm) objects 2,3,4,5,8 ---
    packed = {
        2: b"<</Type/Catalog/Pages 3 0 R>>",
        3: b"<</Type/Pages/Kids[4 0 R 5 0 R]/Count 2>>",
        4: (
            b"<</Type/Page/Parent 3 0 R/MediaBox[0 0 595 842]"
            b"/Resources<</Font<</F1 10 0 R/F2 11 0 R>>>>/Contents 6 0 R>>"
        ),
        5: (
            b"<</Type/Page/Parent 3 0 R/MediaBox[0 0 595 842]"
            b"/Resources<</Font<</F1 10 0 R>>>>/Contents 7 0 R>>"
        ),
        8: b"<</Title(Foreign Fixture One)/Author(Gen Two)/Producer(OtherWriter 9.1)>>",
    }
    header = []
    body = b""
    for num in sorted(packed):
        header.append(b"%d %d" % (num, len(body)))
        body += packed[num] + b" "
    head_bytes = b" ".join(header) + b" "
    objstm_payload = head_bytes + body
    objstm_flate = zlib.compress(objstm_payload)

    # --- content streams (6 Flate with TJ/hex/Tf switches, 7 raw) ---
    c6 = (
        b"BT\r\n/F1 11 Tf\r\n56 780 Td\r\n"
        b"[(Mixed )-250(font )-250(line)] TJ\r\n"
        b"/F2 11 Tf\r\n(: second half) Tj\r\n"
        b"0 -16 Td\r\n<48657820737472696E67> Tj\r\n"
        b"T*\r\n(third line) Tj\r\nET\r\n"
    )
    c6_flate = zlib.compress(c6)
    c7 = (
        b"BT /F1 10 Tf 40 800 Td\r(page two alpha) Tj\r"
        b"0\t-14\tTD\t(beta \\(nested\\) \\101nd octal) Tj\r"
        b"% a comment the parser must skip\r"
        b"0 -14 Td (gamma) Tj ET\r"
    )

    out = bytearray(b"%PDF-1.6\r\n%\xe2\xe3\xcf\xd3\r\n")
    offsets = {}

    def add(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\r\n" % num + body + b"\r\nendobj\r\n")

    add(
        1,
        b"<</Type/ObjStm/N %d/First %d/Length %d/Filter/FlateDecode>>\r\nstream\r\n"
        % (len(packed), len(head_bytes), len(objstm_flate))
        + objstm_flate
        + b"\r\nendstream",
    )
    add(
        6,
        b"<</Length %d/Filter/FlateDecode>>\r\nstream\r\n" % len(c6_flate)
        + c6_flate
        + b"\r\nendstream",
    )
    add(
        7,
        b"<</Length %d>>\r\nstream\r\n" % len(c7) + c7 + b"\r\nendstream",
    )
    add(10, b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>")
    add(11, b"<</Type/Font/Subtype/Type1/BaseFont/Times-Roman>>")

    # --- the XRef stream (object 9): W [1 2 1], entries for 0..11 ---
    xref_off_placeholder = len(out)
    entries = bytearray()

    def entry(t: int, f2: int, f3: int) -> None:
        entries.append(t)
        entries.extend(f2.to_bytes(2, "big"))
        entries.append(f3)

    objstm_index = {num: i for i, num in enumerate(sorted(packed))}
    for num in range(12):
        if num == 0:
            entry(0, 0, 255)
        elif num in packed:
            entry(2, 1, objstm_index[num])  # in ObjStm 1, index i
        elif num == 9:
            entry(1, xref_off_placeholder, 0)
        elif num in offsets:
            entry(1, offsets[num], 0)
        else:
            entry(0, 0, 255)
    xdata = zlib.compress(bytes(entries))
    add(
        9,
        b"<</Type/XRef/Size 12/W[1 2 1]/Index[0 12]/Root 2 0 R/Info 8 0 R"
        b"/Filter/FlateDecode/Length %d>>\r\nstream\r\n" % len(xdata)
        + xdata
        + b"\r\nendstream",
    )
    out.extend(b"startxref\r\n%d\r\n%%%%EOF\r\n" % offsets[9])
    return bytes(out)


def f2_contents_array() -> bytes:
    objs = {}
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>"
    objs[3] = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]\n"
        b"   /Resources << /Font << /F1 6 0 R >> >>\n"
        b"   /Contents [ 4 0 R\n\t5 0 R ] >>"
    )
    c4 = (
        b"BT\n/F1 12 Tf\n72 720 Td\n(first stream line one) Tj\n"
        b"0 -14 Td\n(continues \\(parenthetical\\) text) Tj\n"
    )
    c5 = (
        b"% comment at stream head\n"
        b"0 -14 Td\n(second stream line: \\110\\105\\114\\114\\117) Tj\nET\n"
    )
    objs[4] = b"<< /Length %d >>\nstream\n" % len(c4) + c4 + b"\nendstream"
    objs[5] = b"<< /Length %d >>\nstream\n" % len(c5) + c5 + b"\nendstream"
    objs[6] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    objs[7] = b"<< /Title (Array Contents) /Producer (ThirdWriter) >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n")
    xref_at = len(out)
    out.extend(b"xref\n0 %d\n" % (len(objs) + 1))
    out.extend(b"0000000000 65535 f \n")
    for num in sorted(objs):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(
        b"trailer\n<< /Size %d /Root 1 0 R /Info 7 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def f3_incremental() -> bytes:
    # base document
    objs = {}
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    objs[3] = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    )
    c4a = b"BT /F1 12 Tf 72 720 Td (ORIGINAL text v1) Tj ET"
    objs[4] = b"<< /Length %d >>\nstream\n" % len(c4a) + c4a + b"\nendstream"
    objs[5] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objs[6] = b"<< /Title (Incremental Doc) >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n")
    xref1 = len(out)
    out.extend(b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1))
    for num in sorted(objs):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(
        b"trailer\n<< /Size %d /Root 1 0 R /Info 6 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref1)
    )

    # incremental update: object 4 redefined (new page text)
    c4b = (
        b"BT /F1 12 Tf 72 720 Td (UPDATED text v2) Tj "
        b"0 -14 Td (added line) Tj ET"
    )
    upd_off = len(out)
    out.extend(
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c4b)
        + c4b
        + b"\nendstream\nendobj\n"
    )
    xref2 = len(out)
    out.extend(b"xref\n0 1\n0000000000 65535 f \n4 1\n%010d 00000 n \n" % upd_off)
    out.extend(
        b"trailer\n<< /Size 7 /Root 1 0 R /Info 6 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (xref1, xref2)
    )
    return bytes(out)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, fn in [
        ("f1_xref_objstm.pdf", f1_xref_objstm),
        ("f2_contents_array.pdf", f2_contents_array),
        ("f3_incremental.pdf", f3_incremental),
    ]:
        data = fn()
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
