"""Property test: the canonical fast path in the URL normalizers must be
byte-identical to the slow (urlparse round-trip) path."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_ray.functions import urls as U

BASE = "https://base.example.com/dir/page.html"


def slow_normalize(href, base):
    """Force the slow path by temporarily disabling the fast-path regex."""
    real = U._CANONICAL_RE
    U._CANONICAL_RE = re.compile(r"(?!x)x")  # never matches
    try:
        return U.normalize_url(href, base)
    finally:
        U._CANONICAL_RE = real


def slow_seen_key(href, base):
    real = U._CANONICAL_RE
    U._CANONICAL_RE = re.compile(r"(?!x)x")
    try:
        return U.normalize_url_for_deep_crawl(href, base)
    finally:
        U._CANONICAL_RE = real


url_strategy = st.builds(
    lambda scheme, host, port, segs, trail, q, frag: (
        f"{scheme}://{host}{port}"
        + ("/" + "/".join(segs) if segs else "")
        + trail
        + q
        + frag
    ),
    scheme=st.sampled_from(["http", "https", "HTTPS"]),
    host=st.sampled_from(
        ["a.com", "sub.ex-ample.org", "A.COM", "x9.co.uk", "site0.example.com"]
    ),
    port=st.sampled_from(["", ":8080"]),
    segs=st.lists(
        st.text(
            alphabet="abcXYZ019_.~-% ",
            min_size=1,
            max_size=6,
        ),
        max_size=4,
    ),
    trail=st.sampled_from(["", "/"]),
    q=st.sampled_from(["", "?b=2&a=1", "?utm_source=x", "?ref=1&k=2"]),
    frag=st.sampled_from(["", "#frag"]),
)


@settings(max_examples=300, deadline=None)
@given(href=url_strategy)
def test_normalize_fast_path_parity(href):
    assert U.normalize_url(href, BASE) == slow_normalize(href, BASE)


@settings(max_examples=300, deadline=None)
@given(href=url_strategy)
def test_seen_key_fast_path_parity(href):
    assert U.normalize_url_for_deep_crawl(href, BASE) == slow_seen_key(href, BASE)
