"""cleaned_html byte ratchet over the reference's 25 .html fixtures
(r3 VERDICT task #5 — the markdown-style sweep one level earlier).

The reference's own scrape strategy can't execute here (bs4/lxml absent),
so cleaned_html has no executable cross-engine oracle the way markdown
does; this ratchet pins OUR cleaned_html per fixture (md5 + length,
tests/data/cleaned_html_pins.json) so any scrape change that silently
alters the cleaned stream fails loudly and must regenerate the pins in
the same commit that justifies the change. Intentional divergences from
the reference's lxml cleaner remain documented in
tests/test_reference_scrape_cases.py; this file guards OUR byte
stability, the input contract of the (byte-parity-proven) markdown seam.

Regenerate after an intentional scrape change:
    python tests/test_cleaned_html_ratchet.py --regen
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest

REF_GLOB = "/root/reference/**/*.html"
PINS = os.path.join(os.path.dirname(__file__), "data", "cleaned_html_pins.json")

pytestmark = pytest.mark.skipif(
    not glob.glob(REF_GLOB, recursive=True), reason="reference fixtures absent"
)


def _sweep():
    from crawl4ai_ray.html.scrape import scrape_page

    out = {}
    for f in sorted(glob.glob(REF_GLOB, recursive=True)):
        html = open(f, encoding="utf-8", errors="replace").read()
        if len(html) > 2_000_000:
            continue
        r = scrape_page("https://example.com/x", html)
        out[f.replace("/root/reference/", "")] = {
            "md5": hashlib.md5(r["cleaned_html"].encode()).hexdigest(),
            "len": len(r["cleaned_html"]),
        }
    return out


def test_cleaned_html_pins_hold():
    pins = json.load(open(PINS))
    got = _sweep()
    assert set(got) == set(pins), (
        "fixture set changed — regenerate pins deliberately"
    )
    diffs = {
        k: (pins[k], got[k]) for k in pins if got[k] != pins[k]
    }
    assert not diffs, (
        "cleaned_html drifted on: "
        + ", ".join(sorted(diffs))
        + " — if intentional, regenerate with "
        "`python tests/test_cleaned_html_ratchet.py --regen` in the same "
        "commit"
    )


def test_pins_cover_the_full_fixture_set():
    pins = json.load(open(PINS))
    assert len(pins) >= 25
    # the big real-page fixture must be in the ratchet and non-trivial
    assert pins["tests/async/sample_wikipedia.html"]["len"] > 100_000


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        json.dump(_sweep(), open(PINS, "w"), indent=1, sort_keys=True)
        print(f"regenerated {PINS}")
