"""PDF stage tests (stages/pdf.py — clean-room of the reference's
processors/pdf family; r3 VERDICT missing #5).

The reader is REAL (stdlib zlib + text operators), so these tests lock
actual byte-level behavior: writer→parser round trips with escapes and
both stream encodings, metadata, encrypted/garbage degradation, the full
structuring-heuristic surface on crafted academic-paper text, PNG
predictor inversion against hand-filtered rows, and the Ray actor-pool
fan-out stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from crawl4ai_ray.stages.pdf import (
    PdfExtract,
    apply_png_predictor,
    make_pdf,
    parse_pdf,
    pdf_metadata_batch,
    pdf_pipeline,
    pdf_text_to_html,
    pdf_text_to_markdown,
)


def test_roundtrip_compressed_and_raw():
    pages = [
        ["first line", "second line", "third"],
        ["page two only line"],
    ]
    for compress in (True, False):
        r = parse_pdf(make_pdf(pages, compress=compress))
        assert r["metadata"]["pages"] == 2
        assert r["pages"][0]["raw_text"] == "first line\nsecond line\nthird"
        assert r["pages"][1]["raw_text"] == "page two only line"


def test_roundtrip_escapes_and_flate_edge_bytes():
    """Parens, backslashes, and (regression) Flate payloads ending in
    0x0D — the declared-/Length slice must not lose the last byte the
    way an optional-EOL regex did."""
    tricky = ["a (nested (deep)) b", "back\\slash", "tab\tand ) close"]
    r = parse_pdf(make_pdf([tricky]))
    assert r["pages"][0]["raw_text"] == "\n".join(tricky)
    # brute-force a payload whose compressed form ends in \r: vary a
    # suffix until zlib output's last byte is 0x0D
    import zlib

    for i in range(10_050, 10_000, -1):  # 10049 is known to hit; scan near it
        line = f"xyz {i}"
        if zlib.compress(
            f"BT\n/F1 12 Tf\n72 720 Td\n({line}) Tj\nET".encode()
        ).endswith(b"\r"):
            got = parse_pdf(make_pdf([[line]]))
            assert got["pages"][0]["raw_text"] == line
            break
    else:  # pragma: no cover - distribution makes this effectively impossible
        raise AssertionError("no \\r-tailed compressed payload found")


def test_metadata_and_degradation():
    pdf = make_pdf([["x"]], title="My (Title)", author="An Author")
    m = parse_pdf(pdf)["metadata"]
    assert m["title"] == "My (Title)"
    assert m["author"] == "An Author"
    assert m["producer"] == "crawl4ai_ray"
    assert m["file_size"] == len(pdf)
    assert not m["encrypted"]

    # garbage and empties degrade, never raise
    assert parse_pdf(b"")["metadata"]["pages"] == 0
    assert parse_pdf(b"not a pdf at all")["pages"] == []
    # encrypted flag short-circuits
    enc = pdf.replace(b"/Root", b"/Encrypt 9 0 R /Root")
    r = parse_pdf(enc)
    assert r["metadata"]["encrypted"] and r["pages"] == []


def test_zero_page_pdf():
    r = parse_pdf(make_pdf([]))
    assert r["metadata"]["pages"] == 0 and r["pages"] == []


def test_markdown_structuring_full_surface():
    """Every heuristic of the reference's clean_pdf_text on one crafted
    page (utils.py:213-350): title, authors (page 1), affiliation,
    email, numbered header after blank, section marker, quote, hyphen
    join, citation rewrite, punctuation respacing."""
    text = "\n".join(
        [
            "Distributed Crawling At Scale",
            "Alice Smith, Bob Jones",
            "†Example University",
            "{alice,bob}@example.edu",
            "",
            "1.1 Introduction",
            "We crawl the public web effi-",
            "ciently (Smith et al. 2024) .",
            "",
            "Abstract",
            '"Quoted opening line',
        ]
    )
    md = pdf_text_to_markdown(1, text)
    assert "## Distributed Crawling At Scale" in md
    assert "**Alice Smith** and **Bob Jones**" in md
    assert "*†Example University*" in md
    assert "`{alice,bob}@example.edu`" in md
    assert "### Introduction" in md  # 1.1 → level 2 → ###
    # reference-faithful: the post-header flush breaks the paragraph at
    # the hyphenated line (in_header && not sentence-final → flush), so
    # 'effi' and 'ciently' land in SEPARATE paragraphs — the reference's
    # own behavior, replicated, not a join
    assert "We crawl the public web effi" in md
    assert "ciently [Smith et al. 2024]." in md  # citation + ') .' respace
    # reference-faithful: a lone capitalized 'Abstract' on PAGE 1 hits
    # the author rule (checked before the section rule) → bold
    assert "**Abstract**" in md
    assert '> "Quoted opening line' in md

    # off page 1 the author rule is dormant: section rule takes over and
    # plain capitalized name lines stay paragraphs
    md2 = pdf_text_to_markdown(2, "Abstract\n\nplain text here")
    assert "_[Abstract]_" in md2
    md3 = pdf_text_to_markdown(2, "Alice Smith, Bob Jones\n\nplain text here")
    assert "**" not in md3


def test_html_structuring_mirrors_markdown_classes():
    text = "\n".join(
        [
            "A Title Of Few Words",
            "",
            "2 Methods",
            "body text one",
        ]
    )
    html = pdf_text_to_html(1, text)
    assert "<h2>A Title Of Few Words</h2>" in html
    # "2 Methods" after a blank line: numbered header, md_level
    # min(0+1+1, 6)=2 → h2 (reference utils.py:131-135)
    assert "<h2>Methods</h2>" in html
    assert '<div class="paragraph"><p>body text one</p></div><hr/>' in html


def test_png_predictor_inverts_hand_filtered_rows():
    """Filter three rows with Sub/Up/Paeth by hand, assert the
    un-predictor restores the original bytes."""
    width, bits, ch = 4, 8, 1
    bpp = 1
    orig = np.array(
        [[10, 20, 30, 40], [15, 25, 35, 45], [100, 90, 80, 70]], np.uint8
    )
    rows = []
    # row 0: Sub
    r0 = orig[0].astype(int).copy()
    filt0 = [r0[0]] + [(r0[i] - r0[i - bpp]) % 256 for i in range(1, 4)]
    rows.append(bytes([1] + filt0))
    # row 1: Up (prev = orig row 0)
    filt1 = [(int(orig[1][i]) - int(orig[0][i])) % 256 for i in range(4)]
    rows.append(bytes([2] + filt1))
    # row 2: Paeth (prev = orig row 1)
    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)

    filt2 = []
    for i in range(4):
        a = int(orig[2][i - bpp]) if i >= bpp else 0
        b = int(orig[1][i])
        c = int(orig[1][i - bpp]) if i >= bpp else 0
        filt2.append((int(orig[2][i]) - paeth(a, b, c)) % 256)
    rows.append(bytes([4] + filt2))

    out = apply_png_predictor(b"".join(rows), width, bits, ch)
    assert np.array_equal(
        np.frombuffer(out, np.uint8).reshape(3, 4), orig
    )


def test_pdf_extract_stage_fanout(ray_session):
    """Actor-pool fan-out: one row per page, ids preserved, page
    numbering 1-based per document; metadata batch one row per file."""
    docs = [
        {"doc_id": 1, "pdf": make_pdf([["p one"], ["p two"], ["p three"]])},
        {"doc_id": 2, "pdf": make_pdf([["solo page line a", "line b"]])},
        {"doc_id": 3, "pdf": b"garbage"},
    ]
    ds = ray.data.from_items(docs)
    out = pdf_pipeline(ds, batch_size=2, concurrency=(1, 2)).to_pandas()
    assert len(out) == 4  # 3 + 1 + 0 pages
    assert sorted(out[out["doc_id"] == 1]["page_number"]) == [1, 2, 3]
    row = out[(out["doc_id"] == 2)].iloc[0]
    assert row["raw_text"] == "solo page line a\nline b"
    assert row["n_chars"] == len(row["raw_text"])
    assert (out["markdown"].str.len() > 0).all()

    meta = ds.map_batches(
        pdf_metadata_batch, batch_format="pyarrow"
    ).to_pandas().set_index("doc_id")
    assert meta.loc[1, "n_pages"] == 3
    assert meta.loc[2, "n_pages"] == 1
    assert meta.loc[3, "n_pages"] == 0
    assert meta.loc[1, "producer"] == "crawl4ai_ray"


def test_pdf_roundtrip_property():
    """Property: for any latin-1 page text lines, writer→parser is the
    identity on the line structure (hypothesis over weird characters,
    parens/backslash runs, long lines, many pages)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=255),
        min_size=0, max_size=60,
    )
    pages = st.lists(
        st.lists(line, min_size=1, max_size=6), min_size=1, max_size=4
    )

    @settings(max_examples=60, deadline=None)
    @given(pages=pages, compress=st.booleans())
    def check(pages, compress):
        r = parse_pdf(make_pdf(pages, compress=compress))
        assert r["metadata"]["pages"] == len(pages)
        for pg, want in zip(r["pages"], pages):
            # trailing empty lines are trimmed by the text-op extractor
            # (a final bare Td emits no glyphs); interior structure exact
            want_txt = "\n".join(want)
            while want_txt.endswith("\n"):
                want_txt = want_txt[:-1]
            assert pg["raw_text"] == want_txt

    check()


# ---------------------------------------------------------------------------
# r5 (r4 VERDICT task #2): foreign-layout byte fixtures NOT produced by
# make_pdf — cross-generator shapes: xref streams + /ObjStm packing,
# /Contents arrays, incremental updates, CR-only EOLs, multiple fonts.
# Regenerate with scripts/gen_foreign_pdf_fixtures.py.
# ---------------------------------------------------------------------------

import os as _os

_FOREIGN = _os.path.join(_os.path.dirname(__file__), "data", "pdf_foreign")


def _foreign(name: str) -> bytes:
    with open(_os.path.join(_FOREIGN, name), "rb") as f:
        return f.read()


def test_foreign_xref_stream_objstm():
    """PDF-1.6 layout: no `trailer` keyword — Root/Info come from the
    /Type /XRef stream dict; catalog/pages/page/Info dicts unpack from
    a Flate /ObjStm; \r\n EOLs; TJ kerning arrays; hex strings; Tf
    font switches mid-line; CR-only stream with a %-comment."""
    from crawl4ai_ray.stages.pdf import parse_pdf

    d = parse_pdf(_foreign("f1_xref_objstm.pdf"))
    assert d["metadata"]["title"] == "Foreign Fixture One"
    assert d["metadata"]["author"] == "Gen Two"
    assert d["metadata"]["producer"] == "OtherWriter 9.1"
    assert d["metadata"]["pages"] == 2
    assert not d["metadata"]["encrypted"]
    assert d["pages"][0]["raw_text"] == (
        "Mixed font line: second half\nHex string\nthird line"
    )
    assert d["pages"][1]["raw_text"] == (
        "page two alpha\nbeta (nested) And octal\ngamma"
    )


def test_foreign_contents_array():
    """/Contents [4 0 R 5 0 R]: the two raw streams concatenate into
    one logical content stream (octal escapes, nested parens, comment
    at a stream head, tab separators)."""
    from crawl4ai_ray.stages.pdf import parse_pdf

    d = parse_pdf(_foreign("f2_contents_array.pdf"))
    assert d["metadata"]["title"] == "Array Contents"
    assert d["metadata"]["producer"] == "ThirdWriter"
    assert d["metadata"]["pages"] == 1
    assert d["pages"][0]["raw_text"] == (
        "first stream line one\ncontinues (parenthetical) text\n"
        "second stream line: HELLO"
    )


def test_foreign_incremental_update():
    """An appended incremental update redefines the page-1 content
    object; the LATER definition must win (PyPDF2 semantics via the
    second xref/trailer)."""
    from crawl4ai_ray.stages.pdf import parse_pdf

    d = parse_pdf(_foreign("f3_incremental.pdf"))
    assert d["metadata"]["title"] == "Incremental Doc"
    assert d["metadata"]["pages"] == 1
    assert d["pages"][0]["raw_text"] == "UPDATED text v2\nadded line"
    assert "ORIGINAL" not in d["pages"][0]["raw_text"]
