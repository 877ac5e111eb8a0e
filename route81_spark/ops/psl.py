"""Public-suffix-list (PSL) registrable-domain extraction — the full
publicsuffix.org rule grammar (normal rules, wildcard `*.ck` rules,
exception `!city.kobe.jp` rules, and the implicit default rule `*`),
replacing r7's 15-suffix static subset which could not express
wildcards or exceptions and therefore mis-bucketed those domains.

Reference parity note: route81 itself ships no URL operators (it
delegates its whole query surface to MongoDB, route81.go:181-197);
this module belongs to the LLM-data-pipeline brief. The engine — not
the caller — owns the suffix semantics, the same role MongoDB's server
plays for route81's delegated queries.

Matching algorithm (publicsuffix.org/list/ — public specification):
  1. A rule matches a host when the host ends with the rule's labels
     (a wildcard label `*` matches exactly one label).
  2. If any EXCEPTION rule matches, it prevails; the public suffix is
     the exception rule minus its leftmost label.
  3. Otherwise the prevailing rule is the matching rule with the most
     labels; if none match, the default rule `*` applies (public
     suffix = the host's last label).
  4. The registrable (pay-level) domain is the public suffix plus one
     more label; a host that IS a public suffix has none (NULL).

Two execution modes, same semantics (property-pinned against each
other and against a pure-Python spec twin in tests):

* **Literal mode** (`registrable_domain_psl` with a rule list): the
  bounded rule set compiles into ONE pure-Column expression — label
  tails probed against per-depth literal IN sets, `F.greatest` for the
  longest match. Zero Python, zero shuffle, zero joins; this is what
  `ops.web.registrable_domain` runs on by default. The full ~9k-rule
  publicsuffix.org list is itself a bounded artifact and still fits
  (Catalyst converts large INs to hash-set InSet predicates), though
  plans get big; prefer table mode past a few thousand rules.

* **Table mode** (`psl_domain_table` with a rules DataFrame): the rule
  table is normalized to (name, kind, depth) and BROADCAST-joined
  against the host's per-depth label tails — one broadcast hash join
  per (kind, depth) present (bounded: real PSL rules are <= 5 labels),
  each map-only on the crawl side. No explode, no re-group, no
  fact-table shuffle; at 100 TB the crawl side stays a straight
  projection and only the bounded rule table ever moves.

The vendored `DEFAULT_PSL_RULES` snapshot is a deterministic subset of
the public list: the multi-label suffixes the r7 static set carried,
the common country registries, and the real wildcard/exception
families (`*.ck` / `!www.ck`, the Japanese designated-city
`*.<city>.jp` / `!city.<city>.jp` pairs). Swap in the full list by
passing every line of publicsuffix.org's ICANN section to either mode
— the grammar here is the list's own.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from route81_spark.ops.util import lit_string_array

# Deterministic vendored snapshot of publicsuffix.org rules (ICANN
# section grammar: `name`, `*.name` wildcard, `!name` exception).
# Contains every suffix the r7 static subset knew plus the rule kinds
# it could not express.
DEFAULT_PSL_RULES: tuple[str, ...] = (
    # generic TLDs (behaviorally identical to the default rule; listed
    # for fidelity with the real list)
    "com", "org", "net", "io", "de", "uk", "jp", "au", "br", "in",
    "nz", "cn", "mx", "fr", "it", "nl", "us", "kr", "za", "ck",
    # United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # Japan — second-level
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # Japan — designated-city wildcard + city-hall exception pairs
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp",
    # Cook Islands — the canonical wildcard + exception TLD
    "*.ck", "!www.ck",
    # Brazil / India / New Zealand / China / Mexico
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    # Korea / South Africa
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
    "co.za", "org.za", "net.za", "web.za",
    # United States — state + k12 (real 3-label normal rules)
    "ca.us", "ny.us", "tx.us", "ma.us",
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.ma.us",
)


def parse_psl_rules(rules: Sequence[str]) -> dict[str, dict[int, list[str]]]:
    """Normalize PSL-format rule lines into per-kind, per-depth name
    sets:
      normal[d] = rule names with d labels (match depth d)
      wild[b]   = wildcard BASES with b labels (match depth b+1)
      exc[d]    = exception names with d labels (public suffix = d-1)
    Lines are lowercased, trailing dots folded, comments (//) and
    blanks skipped — a raw publicsuffix.org ICANN section feeds
    straight in."""
    normal: dict[int, list[str]] = {}
    wild: dict[int, list[str]] = {}
    exc: dict[int, list[str]] = {}
    for raw in rules:
        line = raw.strip().lower().rstrip(".")
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            name = line[1:]
            exc.setdefault(name.count(".") + 1, []).append(name)
        elif line.startswith("*."):
            base = line[2:]
            wild.setdefault(base.count(".") + 1, []).append(base)
        elif line == "*":
            continue  # the default rule is always implicit
        else:
            normal.setdefault(line.count(".") + 1, []).append(line)
    return {"normal": normal, "wild": wild, "exc": exc}


def _fold_host(host: Column) -> Column:
    """Trailing-dot FQDN fold + lowercase (rule names are lowercase)."""
    return F.lower(F.regexp_replace(host, r"\.$", ""))


def _is_ip_literal(dotless: Column) -> Column:
    """Dotted IPv4 and bracketed IPv6 literals have no registrable
    domain (an IPv4-mapped '[::ffff:192.0.2.1]' contains dots and
    would otherwise label-split)."""
    return dotless.rlike(r"^[0-9]+(\.[0-9]+){3}$") | dotless.startswith("[")


def _tail(labels: Column, n: Column, d) -> Column:
    """Last `d` labels of the array joined with '.' (`d` int or
    Column); callers guard n >= d."""
    return F.array_join(F.slice(labels, n - d + 1, d), ".")


def registrable_domain_psl(
    host: Column, rules: Sequence[str] = DEFAULT_PSL_RULES
) -> Column:
    """Registrable domain under the full PSL algorithm, compiled to ONE
    pure-Column expression from a bounded literal rule list — the
    zero-shuffle fast path (table mode for rule DataFrames is
    `psl_domain_table`).

    The label array binds ONCE (transform over a 1-element array — the
    ProjectCollapse/Janino guard shared with url_canonicalize), so a
    computed host expression evaluates a single time however many
    depth probes reference it; NULL hosts propagate to NULL."""
    parsed = parse_psl_rules(rules)

    def rd(labels: Column) -> Column:
        n = F.size(labels)
        # public-suffix length: the default rule, every matching
        # normal rule, every matching wildcard (base depth b matches
        # as depth b+1, needing one label beyond the base)
        cands: list[Column] = [F.lit(1)]
        for d, names in sorted(parsed["normal"].items()):
            if d < 2:
                continue  # 1-label normal rules == the default rule
            cands.append(
                F.when((n >= d) & _tail(labels, n, d).isin(*names), d).otherwise(1)
            )
        for b, bases in sorted(parsed["wild"].items()):
            cands.append(
                F.when(
                    (n >= b + 1) & _tail(labels, n, b).isin(*bases), b + 1
                ).otherwise(1)
            )
        ps = F.greatest(*cands) if len(cands) > 1 else cands[0]
        # a matching exception rule prevails: public suffix = the
        # exception minus its leftmost label (deepest exception first)
        for d, names in sorted(parsed["exc"].items(), reverse=True):
            ps = F.when(
                (n >= d) & _tail(labels, n, d).isin(*names), d - 1
            ).otherwise(ps)
        reg_len = ps + 1
        return F.when(n >= reg_len, _tail(labels, n, reg_len)).otherwise(
            F.lit(None).cast("string")
        )

    dotless = _fold_host(host)
    out = F.get(F.transform(F.array(F.split(dotless, r"\.")), rd), 0)
    return F.when(_is_ip_literal(dotless), F.lit(None).cast("string")).otherwise(out)


def normalize_psl_table(rules_df: DataFrame, rule_col: str | None = None) -> DataFrame:
    """One-column DataFrame of PSL-format lines -> (name, kind, depth):
    kind 'normal' | 'wild' (name = the BASE; matches depth+1) | 'exc';
    comments/blanks dropped, lowercased, trailing dots folded. Pure
    Column — runs where the (bounded) rule table sits."""
    col = F.col(rule_col or rules_df.columns[0])
    raw = F.lower(F.regexp_replace(F.trim(col), r"\.$", ""))
    line = F.col("__psl_line")
    kind = (
        F.when(line.startswith("!"), F.lit("exc"))
        .when(line.startswith("*."), F.lit("wild"))
        .otherwise(F.lit("normal"))
    )
    name = (
        F.when(line.startswith("!"), F.expr("substring(__psl_line, 2)"))
        .when(line.startswith("*."), F.expr("substring(__psl_line, 3)"))
        .otherwise(line)
    )
    return (
        rules_df.select(raw.alias("__psl_line"))
        .filter((line != "") & (line != "*") & ~line.startswith("//"))
        .select(name.alias("name"), kind.alias("kind"))
        .withColumn("depth", F.size(F.split(F.col("name"), r"\.")).cast("int"))
        .distinct()
    )


def psl_domain_table(
    df: DataFrame,
    rules_df: DataFrame,
    host_col: str | Column = "host",
    out_col: str = "domain",
    rule_col: str | None = None,
) -> DataFrame:
    """Registrable-domain extraction with the rule set as a DataFrame —
    the scale path for full publicsuffix.org lists: the normalized
    (name, kind, depth) table BROADCASTs and longest-match-joins
    against the host's per-depth label tails, one broadcast hash join
    per (kind, depth) present. The fact side is map-only throughout:
    no explode, no re-group, no shuffle — at 100 TB the crawl table
    never moves, only the bounded rule table does. Semantics identical
    to `registrable_domain_psl` (property-pinned in tests).

    The only driver-side action is ONE collect of the normalized rule
    table — a bounded model artifact (~10k rows for the real
    publicsuffix.org list, the same class as codebooks/Bloom bitmaps),
    never the corpus. Collecting the whole table (not just its (kind,
    depth) pairs) lets every per-(kind, depth) join side be a literal
    local relation: the previous form re-ran the normalize + distinct
    pipeline once per broadcast build (an Exchange + two HashAggregates
    and a scheduler job EACH — six jobs of fixed overhead per query)."""
    rules = normalize_psl_table(rules_df, rule_col)
    rows = rules.select("kind", "depth", "name").collect()
    kd = {(r["kind"], r["depth"]) for r in rows}
    norm_depths = sorted(d for k, d in kd if k == "normal" and d >= 2)
    wild_bases = sorted(d for k, d in kd if k == "wild")
    exc_depths = sorted(d for k, d in kd if k == "exc")

    spark = df.sparkSession

    def rule_side(colname: str, kind: str, depth: int) -> DataFrame:
        # names are distinct within (kind, depth) by normalize's
        # distinct, so the left joins keep their 1:1 multiplicity
        names = sorted(
            r["name"] for r in rows
            if r["kind"] == kind and r["depth"] == depth
        )
        return spark.range(1).select(
            F.explode(lit_string_array(names)).alias(colname)
        )

    host = F.col(host_col) if isinstance(host_col, str) else host_col
    dotless = _fold_host(host)

    flags = (
        [f"__psl_nk{d}" for d in norm_depths]
        + [f"__psl_wk{b}" for b in wild_bases]
        + [f"__psl_xk{d}" for d in exc_depths]
    )
    clash = ({"__psl_labels", "__psl_n", *flags} | {out_col}) & set(df.columns)
    if clash:
        raise ValueError(
            f"psl_domain_table: input columns collide with reserved or "
            f"output names {sorted(clash)}"
        )

    work = df.withColumn("__psl_labels", F.split(dotless, r"\.")).withColumn(
        "__psl_n", F.size(F.col("__psl_labels"))
    )
    labels, n = F.col("__psl_labels"), F.col("__psl_n")

    def guarded_tail(d: int, need: int) -> Column:
        # NULL when the host is too short — NULL join keys never match
        return F.when(n >= need, _tail(labels, n, d))

    for d in norm_depths:
        work = work.join(
            F.broadcast(rule_side(f"__psl_nk{d}", "normal", d)),
            guarded_tail(d, d) == F.col(f"__psl_nk{d}"),
            "left",
        )
    for b in wild_bases:
        # a wildcard of base depth b matches hosts with >= b+1 labels
        work = work.join(
            F.broadcast(rule_side(f"__psl_wk{b}", "wild", b)),
            guarded_tail(b, b + 1) == F.col(f"__psl_wk{b}"),
            "left",
        )
    for d in exc_depths:
        work = work.join(
            F.broadcast(rule_side(f"__psl_xk{d}", "exc", d)),
            guarded_tail(d, d) == F.col(f"__psl_xk{d}"),
            "left",
        )

    cands = [F.lit(1)]
    cands += [
        F.when(F.col(f"__psl_nk{d}").isNotNull(), d).otherwise(1)
        for d in norm_depths
    ]
    cands += [
        F.when(F.col(f"__psl_wk{b}").isNotNull(), b + 1).otherwise(1)
        for b in wild_bases
    ]
    ps = F.greatest(*cands) if len(cands) > 1 else cands[0]
    for d in sorted(exc_depths, reverse=True):
        ps = F.when(F.col(f"__psl_xk{d}").isNotNull(), d - 1).otherwise(ps)

    reg_len = ps + 1
    dom = F.when(n >= reg_len, _tail(labels, n, reg_len)).otherwise(
        F.lit(None).cast("string")
    )
    dom = F.when(_is_ip_literal(dotless), F.lit(None).cast("string")).otherwise(dom)
    return work.withColumn(out_col, dom).drop("__psl_labels", "__psl_n", *flags)
