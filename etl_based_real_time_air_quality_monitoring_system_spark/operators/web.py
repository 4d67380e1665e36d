"""URL / domain curation operators — the CommonCrawl-style provenance
stage of a pretraining pipeline (the one common public-pipeline stage
the text/dedup families didn't yet cover): hostname extraction,
registered-domain rollup under a public-suffix rule table, per-domain
document/token accounting, and domain blocklist filtering (the
URL-level filters of C4 [Raffel et al. 2020 §2.2] and RefinedWeb
[Penedo et al. 2023 §3.1]).

Everything is exact string arithmetic on JVM-side built-ins (regex,
split, endswith, higher-order array folds) — no Python, no UDF, and
trivially DuckDB-oracle-able.  The suffix-rule table is a broadcast
LITERAL (the PQ-codebook idiom): real deployments interpolate the
public-suffix list (publicsuffix.org) — plain rules only; its
wildcard/exception entries pre-expand to plain rules offline.

Scale shape: host/domain extraction is in-scan (pure map);
``domain_rollup`` is one map-side-combinable aggregation keyed on the
registered domain (web corpora have ~1e7 registered domains — a small
shuffle at any corpus size); ``blocklist_filter`` with a literal list
is in-scan, and a DataFrame-sized blocklist becomes a broadcast
anti-join.  Composes with ``dedup.source_overlap_matrix`` for
cross-source provenance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .text import token_count

#: Starter suffix-rule table (a deployment interpolates the full
#: public-suffix list).  Multi-label rules MUST be listed alongside
#: their parent TLD ("co.uk" and "uk") for PSL semantics.
DEFAULT_SUFFIX_RULES: tuple[str, ...] = (
    "com", "org", "net", "edu", "gov", "io", "dev", "app",
    "uk", "co.uk", "ac.uk", "jp", "co.jp", "ac.jp", "au", "com.au",
    "github.io",
)

#: host grabber: scheme '://' then either a bracketed IPv6 literal
#: (kept whole — '[2001:db8::1]'; without the alternative the ':'
#: in the address would truncate it to '[2001') or everything up to
#: / : ? # — the authority's host for well-formed http(s) URLs
#: (userinfo/port are cut by the ':'/'@'-free character class; see
#: url tests)
_HOST_RE = (
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?"
    "(\\[[^\\]/?#]+\\]|[^/:?#@]+)"
)

#: join-key stand-in for "no resolvable registered domain" — NUL is
#: not a valid hostname byte, so no real domain can collide with it
_NO_DOMAIN_SENTINEL = "\x00unresolved"

#: IP-shaped hosts carry no registrable domain: bracketed IPv6
#: literals, or all-digits-and-dots (IPv4 and friends — without this
#: guard 1.2.3.4 falls through the last-two-labels fallback to a
#: bogus "registered domain" of '3.4')
_IP_HOST_RE = "^(\\[.*|[0-9.]+)$"


def host_of(url: Column | str) -> Column:
    """Lowercased hostname of a URL (exact regex extraction — the
    same pattern string the oracle runs; empty match -> NULL).
    Bracketed IPv6 literals come back whole, brackets included
    ('[2001:db8::1]') — ``registered_domain_of`` maps them (and
    all-numeric IPv4 hosts) to NULL rather than inventing a
    registered domain."""
    c = F.col(url) if isinstance(url, str) else url
    # nullif, not when(h=='')/otherwise(h): the latter embeds the
    # regex twice and both copies execute per row (no CSE)
    return F.nullif(
        F.lower(F.regexp_extract(c, _HOST_RE, 1)), F.lit("")
    )


def suffix_of(
    host: Column, rules: Sequence[str] = DEFAULT_SUFFIX_RULES
) -> Column:
    """Longest rule that is a PROPER suffix of the host ('' when none
    matches) — the public-suffix fold :func:`registered_domain_of`
    resolves against.  Exposed so DataFrame callers can MATERIALIZE
    it once under an alias (the ``_host`` idiom): the fold is a
    higher-order ``aggregate`` (CodegenFallback, no common-
    subexpression elimination), and the registered-domain CASE
    references it three times — inlined, it runs 3x per row and
    triples the generated expression tree (measured ~2.5x the whole
    screen's first-run cost at the blocklist gate)."""
    rlit = F.lit(list(rules)).cast("array<string>")
    return F.aggregate(
        F.filter(
            rlit, lambda r: F.endswith(host, F.concat(F.lit("."), r))
        ),
        F.lit("").cast("string"),
        lambda acc, r: F.when(F.length(r) > F.length(acc), r).otherwise(acc),
    )


def registered_domain_of(
    host: Column,
    rules: Sequence[str] = DEFAULT_SUFFIX_RULES,
    suffix: Column | None = None,
) -> Column:
    """Registered (pay-level) domain of a hostname under a plain
    public-suffix rule table: the longest rule that is a PROPER
    suffix of the host wins, and the registered domain is the label
    left of it plus the suffix.  A host that IS a public suffix has
    no registered domain (NULL, PSL semantics); a host matching no
    rule falls back to its last two labels (the PSL's implicit ``*``
    default rule), NULL for single-label hosts.

    No tie-break is needed: two equal-length proper suffixes of the
    same host are the same string, so the longest match is unique —
    the higher-order fold is order-independent.

    Pass MATERIALIZED columns (project ``host_of(url)`` AND
    ``suffix_of(host)`` under aliases first, the ``token_count_of``
    idiom), not the extraction expressions themselves: higher-order
    functions are CodegenFallback with no common-subexpression
    elimination, so an embedded regex host expression would
    re-execute once per suffix rule per row, and an inlined suffix
    fold (the ``suffix=None`` convenience default) runs 3x per row —
    multipliers on the dominant per-row cost of a pure-map curation
    stage."""
    if suffix is None:
        suffix = suffix_of(host, rules)
    labels = F.split(host, r"\.")
    fallback = F.when(
        F.size(labels) >= 2,
        F.concat_ws(
            ".", F.element_at(labels, -2), F.element_at(labels, -1)
        ),
    ).otherwise(F.lit(None).cast("string"))
    prefix = host.substr(
        F.lit(1), F.length(host) - F.length(suffix) - F.lit(1)
    )
    last_label = F.element_at(F.split(prefix, r"\."), -1)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        # IP hosts (bracketed IPv6, all-numeric IPv4) have no
        # registrable domain — guard BEFORE the suffix rules so they
        # can't leak through the last-two-labels fallback
        .when(host.rlike(_IP_HOST_RE), F.lit(None).cast("string"))
        .when(host.isin(*rules), F.lit(None).cast("string"))
        .when(suffix == "", fallback)
        .otherwise(F.concat(last_label, F.lit("."), suffix))
    )


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    text_col: str | None = "text",
    rules: Sequence[str] = DEFAULT_SUFFIX_RULES,
) -> DataFrame:
    """Per-registered-domain corpus accounting: documents, distinct
    hosts, and (when ``text_col`` is given) exact token totals — the
    table a curation run reads to decide per-domain caps and to spot
    a single domain dominating the mixture (the C4/RefinedWeb
    provenance report).  Rows whose URL yields no registered domain
    (bare public suffixes, unparseable URLs) roll up under NULL so
    nothing is silently dropped."""
    hosts = df.select(
        host_of(url_col).alias("_host"),
        *(
            [token_count(text_col).alias("_n_tok")]
            if text_col is not None
            else []
        ),
    ).withColumn("_sfx", suffix_of(F.col("_host"), rules))
    base = hosts.select(
        registered_domain_of(
            F.col("_host"), rules, suffix=F.col("_sfx")
        ).alias("domain"),
        "_host",
        *(["_n_tok"] if text_col is not None else []),
    )
    aggs = [
        F.count("*").alias("n_docs"),
        F.count_distinct("_host").alias("n_hosts"),
    ]
    if text_col is not None:
        aggs.append(F.sum("_n_tok").alias("n_tokens"))
    return base.groupBy("domain").agg(*aggs)


def domain_capped_sample(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    rules: Sequence[str] = DEFAULT_SUFFIX_RULES,
    salt: str = "domcap:v1",
    keep_unhosted: bool = False,
) -> DataFrame:
    """ENFORCE a per-registered-domain contribution cap — the action
    a C4/RefinedWeb curation run takes from :func:`domain_rollup`'s
    report: no single registered domain may contribute more than
    ``cap`` documents to the mixture (subdomains count against their
    parent — blocking-level granularity, same as
    :func:`blocklist_filter`).

    Membership is 100% deterministic (the
    ``stratified_quota_sample`` recipe): rows within a domain are
    ranked by salted content hash of the id with the id as
    tie-break, first ``cap`` kept — a pure function of (content,
    cap), reproducible across runs, partitionings, and engines.

    Rows whose URL yields NO registered domain but does have a host
    (bare public suffixes, IP hosts) are capped PER HOST — the best
    provenance unit available.  Rows with no parseable host at all
    have no provenance and are dropped by default (the conservative
    curation posture, as in :func:`blocklist_filter`); pass
    ``keep_unhosted=True`` to retain them uncapped.

    Plan at 100 TB: host/domain extraction in-scan (projected once —
    the CodegenFallback/no-CSE rule), then ONE shuffle on the
    ~1e7-cardinality domain key whose window compiles with a
    map-side WindowGroupLimit (the literal rank bound), so only
    ~cap rows per domain per input partition reach the exchange."""
    from pyspark.sql import Window

    from .sampling import salted_hash

    if cap < 1:
        raise ValueError("domain_capped_sample: cap must be >= 1")
    reserved = ("_host", "_sfx", "_dom", "_grp", "_crank")
    for r in reserved:
        if r in df.columns:
            raise ValueError(
                f"domain_capped_sample: input already has column {r}"
            )
    tagged = (
        df.withColumn("_host", host_of(url_col))
        .withColumn("_sfx", suffix_of(F.col("_host"), rules))
        .withColumn(
            "_dom",
            registered_domain_of(
                F.col("_host"), rules, suffix=F.col("_sfx")
            ),
        )
    )
    grp = F.coalesce(F.col("_dom"), F.col("_host"))
    unhosted = tagged.filter(F.col("_host").isNull()).drop(
        "_host", "_sfx", "_dom"
    )
    capped = (
        tagged.filter(F.col("_host").isNotNull())
        .withColumn("_grp", grp)
        .withColumn(
            "_crank",
            F.row_number().over(
                Window.partitionBy("_grp").orderBy(
                    salted_hash(id_col, salt), F.col(id_col)
                )
            ),
        )
        .filter(F.col("_crank") <= F.lit(int(cap)))
        .drop("_host", "_sfx", "_dom", "_grp", "_crank")
    )
    if keep_unhosted:
        return capped.unionByName(unhosted)
    return capped


def blocklist_filter(
    df: DataFrame,
    blocked: Sequence[str] | DataFrame,
    url_col: str = "url",
    rules: Sequence[str] = DEFAULT_SUFFIX_RULES,
    keep_unresolved: bool = False,
) -> DataFrame:
    """Drop documents whose REGISTERED DOMAIN is blocklisted (the C4
    "bad domains" screen) — blocking at the registered-domain level
    catches every subdomain of a blocked site, which host-string
    matching misses.  ``blocked`` as a literal list stays in-scan;
    as a DataFrame (column ``domain``) it becomes a broadcast
    LEFT ANTI join — use that form for real blocklists (1e5+ rows).
    Documents with NO resolvable registered domain are dropped by
    default (the conservative curation posture); pass
    ``keep_unresolved=True`` to retain them.

    Plan shape: BOTH forms compile to one broadcast LEFT ANTI join on
    a coalesced domain key — the null-drop rides in the JOIN KEY via
    a sentinel (a NUL-prefixed string no real domain can be; the
    sentinel row joins the blocklist only when unresolved rows should
    drop) instead of a separate ``isNotNull`` filter.  A filter on
    the derived column is a trap: predicate pushdown substitutes the
    ENTIRE domain CASE (with ~10 inlined copies of the host regex
    and, transitively, the URL expression) below the projections and
    then recomputes it in the project — measured ~6x the whole
    screen's cost at the gate.  Join keys are projected exactly once;
    ``_host`` stays a multiply-referenced alias that CollapseProject
    leaves materialized."""
    spark = df.sparkSession
    for r in ("_host", "_sfx", "_dom", "_key"):
        if r in df.columns:
            raise ValueError(
                f"blocklist_filter: input already has column {r}"
            )
    tagged = (
        df.withColumn("_host", host_of(url_col))
        .withColumn("_sfx", suffix_of(F.col("_host"), rules))
        .withColumn(
            "_dom",
            registered_domain_of(
                F.col("_host"), rules, suffix=F.col("_sfx")
            ),
        )
    )
    if isinstance(blocked, DataFrame):
        bl = blocked.select(F.col("domain").alias("_key"))
    else:
        rows = [(d,) for d in blocked]
        bl = spark.createDataFrame(rows, "_key string")
    if not keep_unresolved:
        bl = bl.unionByName(
            spark.createDataFrame([(_NO_DOMAIN_SENTINEL,)], "_key string")
        )
    keyed = tagged.withColumn(
        "_key", F.coalesce(F.col("_dom"), F.lit(_NO_DOMAIN_SENTINEL))
    )
    return keyed.join(F.broadcast(bl), "_key", "left_anti").drop(
        "_host", "_sfx", "_dom", "_key"
    )
