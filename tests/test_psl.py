"""Full public-suffix-list extraction (ops/psl.py): rule-grammar unit
cases (normal/wildcard/exception/default), literal-mode == table-mode
parity, the broadcast plan pin for table mode, and a hypothesis sweep
against an independent pure-Python PSL spec twin."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from route81_spark.ops.psl import (
    DEFAULT_PSL_RULES,
    parse_psl_rules,
    psl_domain_table,
    registrable_domain_psl,
)


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


# ------------------------------------------------------------------
# independent pure-Python spec twin (textbook publicsuffix.org
# algorithm — matches rules bottom-up, exception prevails, longest
# match, default rule `*`)
# ------------------------------------------------------------------

def ref_psl(host: str | None, rules=DEFAULT_PSL_RULES) -> str | None:
    if host is None:
        return None
    parsed = parse_psl_rules(rules)
    dotless = re.sub(r"\.$", "", host.lower())
    if re.match(r"^[0-9]+(\.[0-9]+){3}$", dotless) or dotless.startswith("["):
        return None
    labels = dotless.split(".")
    n = len(labels)

    def tail(d: int) -> str:
        return ".".join(labels[n - d:])

    ps = 1
    for d, names in parsed["normal"].items():
        if d >= 2 and n >= d and tail(d) in names:
            ps = max(ps, d)
    for b, bases in parsed["wild"].items():
        if n >= b + 1 and tail(b) in bases:
            ps = max(ps, b + 1)
    for d in sorted(parsed["exc"], reverse=True):
        if n >= d and tail(d) in parsed["exc"][d]:
            ps = d - 1
            break
    return tail(ps + 1) if n >= ps + 1 else None


CASES = {
    # plain + multi-label normal rules
    "www.example.co.uk": "example.co.uk",
    "a.b.c.example.com": "example.com",
    "example.com": "example.com",
    "co.uk": None,
    "localhost": None,
    # wildcard *.ck: every 2-label .ck tail is itself a public suffix
    "www.shop.ck": "www.shop.ck",
    "shop.ck": None,
    "ck": None,
    # exception !www.ck: carves www.ck back out of the wildcard
    "www.ck": "www.ck",
    "sub.www.ck": "www.ck",
    # Japanese designated-city pair: *.kobe.jp + !city.kobe.jp
    "x.site1.kobe.jp": "x.site1.kobe.jp",
    "site1.kobe.jp": None,
    "city.kobe.jp": "city.kobe.jp",
    "foo.city.kobe.jp": "city.kobe.jp",
    # 3-label normal rule
    "www.school.k12.ma.us": "school.k12.ma.us",
    "k12.ma.us": None,
    # unknown TLD -> the default rule
    "site9.xyz": "site9.xyz",
    "a.site9.xyz": "site9.xyz",
    "xyz": None,
    # FQDN fold + case fold
    "Example.COM.": "example.com",
    # IP literals
    "192.168.0.1": None,
    "[::1]": None,
    "[::ffff:192.0.2.1]": None,
}


def test_psl_literal_unit_cases(spark):
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registrable_domain_psl(F.col("host")).alias("d")
        ).collect()
    }
    for h, want in CASES.items():
        assert got[h] == want, f"{h!r}: {got[h]!r} != {want!r}"
        assert ref_psl(h) == want, f"spec twin disagrees on {h!r}"


def test_psl_table_matches_literal(spark):
    """Broadcast table mode and literal mode are the same function."""
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    rules_df = spark.createDataFrame(
        [(r,) for r in DEFAULT_PSL_RULES], "rule string"
    )
    tab = {
        r["host"]: r["domain"]
        for r in psl_domain_table(df, rules_df, host_col="host").collect()
    }
    assert tab == dict(CASES)


def test_psl_table_parses_raw_list_format(spark):
    """Comments, blank lines, trailing dots, and mixed case feed
    straight in — the format of a raw publicsuffix.org section."""
    rules_df = spark.createDataFrame(
        [
            ("// ===BEGIN ICANN DOMAINS===",),
            ("",),
            ("COM.",),
            ("*.ck",),
            ("!www.ck",),
            ("co.uk",),
        ],
        "line string",
    )
    df = spark.createDataFrame(
        [("www.shop.ck",), ("www.ck",), ("a.b.co.uk",)], "host string"
    )
    got = {
        r["host"]: r["domain"]
        for r in psl_domain_table(df, rules_df, host_col="host").collect()
    }
    assert got == {
        "www.shop.ck": "www.shop.ck",
        "www.ck": "www.ck",
        "a.b.co.uk": "b.co.uk",
    }


def test_psl_table_rejects_colliding_columns(spark):
    df = spark.createDataFrame([("a.com", 1)], "host string, __psl_n int")
    rules_df = spark.createDataFrame([("com",)], "rule string")
    with pytest.raises(ValueError, match="reserved"):
        psl_domain_table(df, rules_df, host_col="host")


def test_psl_table_plan_broadcasts_rules_fact_never_shuffles(spark):
    """The scale contract: every rule join is a BroadcastHashJoin (no
    SortMergeJoin dragging the crawl table) and NO hash-partitioned
    Exchange appears anywhere — the fact side is map-only."""
    df = spark.range(1000).select(
        F.concat(F.lit("www.site"), F.col("id").cast("string"), F.lit(".ck")).alias("host")
    )
    rules_df = spark.createDataFrame(
        [(r,) for r in DEFAULT_PSL_RULES], "rule string"
    )
    plan = _plan(psl_domain_table(df, rules_df, host_col="host"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the ONLY permitted hash Exchange is the bounded rule table's
    # dedup (name/kind/depth); nothing may shuffle the fact side
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" in head and "hashpartitioning" in block:
            assert "host#" not in block and "__psl_labels" not in block, (
                f"fact side shuffles:\n{plan}"
            )


# ------------------------------------------------------------------
# hypothesis sweep: adversarial hosts + a rule set with every grammar
# feature, literal AND spec twin (table mode is pinned equal above)
# ------------------------------------------------------------------

_FUZZ_RULES = (
    "com", "co.uk", "*.ck", "!www.ck", "*.kobe.jp", "!city.kobe.jp",
    "k12.ma.us", "*.deep.nested.zz", "!ok.deep.nested.zz",
)

_label = st.sampled_from(
    ["www", "a", "b7", "city", "ok", "shop", "x-y", "CITY", ""]
)
_suffix = st.sampled_from(
    ["com", "co.uk", "ck", "www.ck", "kobe.jp", "city.kobe.jp",
     "k12.ma.us", "deep.nested.zz", "ok.deep.nested.zz", "zz", "unknown"]
)


@st.composite
def _hosts(draw):
    k = draw(st.integers(0, 3))
    parts = [draw(_label) for _ in range(k)] + [draw(_suffix)]
    host = ".".join(parts)
    if draw(st.booleans()):
        host += "."
    return host


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None)
@given(hosts=st.lists(_hosts(), min_size=1, max_size=32))
def test_psl_matches_python_reference(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = df.select(
        "host", registrable_domain_psl(F.col("host"), _FUZZ_RULES).alias("d")
    ).collect()
    for r in out:
        want = ref_psl(r["host"], _FUZZ_RULES)
        assert r["d"] == want, (r["host"], r["d"], want)
