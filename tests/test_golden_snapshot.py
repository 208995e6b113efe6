"""Golden-snapshot regression tripwire for the byte-identity invariant.

The north rule requires byte-identical extracted text per url. This hash
covers cleaned_html + raw markdown + citations + text + fit_html for 100
deterministic pages. ANY change to extraction output — intended or not —
flips it; update the constant ONLY for a deliberate, documented format
change (and note it in the round notes, since it breaks cross-round
byte-compat)."""

import hashlib

from crawl4ai_ray.html.markdown import generate_markdown
from crawl4ai_ray.html.scrape import scrape_page
from crawl4ai_ray.sources.pages import build_html, url_of

# round 2, corpus v2: markdown generator reworked for byte-parity with the
# reference's CustomHTML2Text (see test_reference_markdown_cases.py) —
# deliberate format change, documented in NOTES_r2.md
GOLDEN_MD5 = "35746f5b663fd7fe9ad5bd42eadbf70d"


def test_extraction_golden_snapshot():
    h = hashlib.md5()
    for i in range(0, 100):
        html = build_html(i, 500, f"deterministic words w{i} " * 30, "en")
        u = url_of(i)
        r = scrape_page(u, html.encode())
        md = generate_markdown(r["cleaned_root"], base_url=u)
        h.update(r["cleaned_html"].encode())
        h.update(md["raw_markdown"].encode())
        h.update(md["markdown_with_citations"].encode())
        h.update(r["text"].encode())
        h.update(r["fit_html"].encode())
    assert h.hexdigest() == GOLDEN_MD5
