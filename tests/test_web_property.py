"""Property-based fuzzing of url_canonicalize: generate adversarial
URL-ish strings (userinfo, repeated separators, empty components,
garbage) and require the Spark Column chain to agree byte-for-byte
with an independent pure-Python reference implementing the SAME
documented spec — plus idempotence on every canonical output. One
Spark job evaluates the whole example batch (hypothesis drives the
generator; Spark runs once per test, not per example)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from route81_spark.ops.web import TRACKING_PARAM_RE, url_canonicalize

_TRACK = re.compile(TRACKING_PARAM_RE)


def ref_canon(url: str) -> str | None:
    """Pure-Python twin of the documented canonicalization spec."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", url)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = url[m.end():]
    am = re.match(r"^([^/?#]*)", rest)
    auth = am.group(1)
    tail = rest[am.end():]
    auth = re.sub(r"^[^@]*@", "", auth, count=1)
    # bracketed IPv6 authorities keep the whole '[...]' literal as the
    # host; the port only counts when the full remainder is ':digits'
    hm = re.match(r"^(\[[^\]]*\]|[^:]*)", auth)
    host = hm.group(1).lower()
    pm = re.match(r"^(?:\[[^\]]*\]|[^:]*):([0-9]+)$", auth)
    port = pm.group(1) if pm else ""
    if (
        port == ""
        or (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    ):
        port_part = ""
    else:
        port_part = ":" + port
    path_m = re.match(r"^([^?#]*)", tail)
    path = path_m.group(1) or "/"
    qm = re.match(r"^[^?#]*\?([^#]*)", rest)
    query = qm.group(1) if qm else ""
    params = sorted(
        p for p in query.split("&") if p != "" and not _TRACK.search(p)
    )
    q_part = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{port_part}{path}{q_part}"


_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", "s3+x"])
_host = st.sampled_from(
    ["Example.COM", "a.b.co.uk", "LOCALHOST", "x--1.io", "e.com.",
     "[::1]", "[2001:DB8::1]", "[::ffff:192.0.2.1]", "[v1.fe80::a]"]
)
_userinfo = st.sampled_from(["", "u@", "User:Pa ss@", "a@b@"])
_port = st.sampled_from(["", ":80", ":443", ":8080", ":0", ":x"])
_path = st.sampled_from(
    ["", "/", "/A/b", "/p/1/x.html", "//", "/%7Ea", "/a?b" .replace("?", "")]
)
_query = st.sampled_from(
    [
        "", "?", "?a=1", "?b=2&a=1", "?utm_source=x", "?a=1&&b=2",
        "?ref", "?a=1&fbclid=z&z=9", "?==&a=1", "?A=1&a=2",
    ]
)
_frag = st.sampled_from(["", "#", "#f", "#a?b=2"])
_garbage = st.sampled_from(
    ["", "not a url", "://x", "1http://x.com", "http:/x.com", "http://"]
)


@st.composite
def _urls(draw):
    if draw(st.booleans()):
        return draw(_garbage)
    return (
        draw(_scheme) + "://" + draw(_userinfo) + draw(_host)
        + draw(_port) + draw(_path) + draw(_query) + draw(_frag)
    )


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None)
@given(urls=st.lists(_urls(), min_size=1, max_size=24))
def test_url_canonicalize_matches_python_reference(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url",
        url_canonicalize(F.col("url")).alias("c1"),
        url_canonicalize(url_canonicalize(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        want = ref_canon(r["url"])
        assert r["c1"] == want, (r["url"], r["c1"], want)
        # idempotence on whatever came out
        assert r["c2"] == (ref_canon(want) if want is not None else None)
