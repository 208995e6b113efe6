"""URL normalization parity tests — cases modeled on the reference's
tests/test_normalize_url.py plus seen-key and domain edge cases."""

from crawl4ai_ray.functions.urls import (
    extract_extension,
    extract_year,
    get_base_domain,
    host_of,
    is_external_url,
    is_valid_crawl_url,
    normalize_url,
    normalize_url_for_deep_crawl,
    path_depth,
)

BASE = "https://example.com/dir/page.html"


def test_relative_resolution():
    assert normalize_url("../other.html", BASE) == "https://example.com/other.html"
    assert normalize_url("sub/x.html", BASE) == "https://example.com/dir/sub/x.html"
    assert normalize_url("/rooted", BASE) == "https://example.com/rooted"


def test_netloc_lowercased_path_case_kept():
    assert (
        normalize_url("HTTPS://EXAMPLE.COM/Path/Page", "https://example.com")
        == "https://example.com/Path/Page"
    )


def test_trailing_slash_stripped_except_root():
    assert normalize_url("https://a.com/x/", BASE) == "https://a.com/x"
    assert normalize_url("https://a.com/", BASE) == "https://a.com/"


def test_tracking_params_dropped_and_sorted():
    u = normalize_url(
        "https://a.com/p?b=2&a=1&utm_source=x&gclid=1&fbclid=2&ref=r&ref_src=s", BASE
    )
    assert u == "https://a.com/p?a=1&b=2"


def test_fragment_dropped():
    assert normalize_url("https://a.com/p#frag", BASE) == "https://a.com/p"
    assert (
        normalize_url("https://a.com/p#frag", BASE, keep_fragment=True)
        == "https://a.com/p#frag"
    )


def test_empty_href():
    assert normalize_url("", BASE) is None
    assert normalize_url_for_deep_crawl(None, BASE) is None


def test_seen_key_rstrips_all_trailing_slashes():
    assert (
        normalize_url_for_deep_crawl("https://a.com/x///", BASE) == "https://a.com/x"
    )
    # root becomes empty path (reference parse_qs/rstrip semantics)
    assert normalize_url_for_deep_crawl("https://a.com/", BASE) == "https://a.com"


def test_seen_key_tracking_subset():
    # deep-crawl normalizer drops only its 5 params; keeps e.g. gclid
    u = normalize_url_for_deep_crawl("https://a.com/p?utm_source=x&gclid=1", BASE)
    assert u == "https://a.com/p?gclid=1"


def test_get_base_domain():
    assert get_base_domain("https://www.example.com/x") == "example.com"
    assert get_base_domain("https://sub.example.co.uk/x") == "example.co.uk"
    assert get_base_domain("https://example.com:8080/") == "example.com"
    assert get_base_domain("not a url") == ""


def test_is_external():
    assert not is_external_url("https://sub.example.com/a", "example.com")
    assert is_external_url("https://other.org/a", "example.com")
    assert is_external_url("mailto:x@example.com", "example.com")
    assert not is_external_url("/relative/path", "example.com")


def test_validity():
    assert is_valid_crawl_url("https://example.com/x")
    assert not is_valid_crawl_url("ftp://example.com/x")
    assert not is_valid_crawl_url("https://localhost/x")  # no dot


def test_path_depth_and_extension_and_year():
    assert path_depth("https://a.com") == 0
    assert path_depth("https://a.com/") == 0
    assert path_depth("https://a.com/a/b") == 2
    assert extract_extension("https://a.com/f.html?q=1") == "html"
    # reference's _quick_extension scans the whole URL (scorers.py:272-302):
    # extensionless path falls back to the domain's TLD — kept for parity
    assert extract_extension("https://a.com/f") == "com"
    assert extract_extension("no-dots-here") == ""
    assert extract_year("https://a.com/blog/2021/post") == 2021
    assert extract_year("https://a.com/blog/1850/x") is None
    assert host_of("https://A.b.COM:443/x") == "a.b.com"
