"""Lexical retrieval operators — scoring a document corpus against a
small set of keyword queries, the classic sparse-retrieval stage a
training-data pipeline runs for targeted corpus construction
("find me the docs about X"), eval-set curation, and as the recall
baseline next to the embedding-space ANN family
(``operators/similarity.py``).

``bm25_topk`` is Okapi BM25 (Robertson et al., TREC-3 1994) with one
deliberate substitution: the Robertson–Spärck-Jones idf *argument*
``(N - df + 0.5) / (df + 0.5)`` is used directly, WITHOUT the log —
the :func:`~.text.tfidf_terms` precedent (``ln`` differs in the last
ulp between libm and the JVM, which breaks exact cross-engine value
comparison, while ratios of small exact integers under
correctly-rounded IEEE ops are bit-identical in any engine).  The
substitution is monotone in the true idf, so per-term orderings
agree; summed scores weight rare terms more sharply than log-idf
BM25 does — acceptable for a curation screen and pinned exactly by
the differential oracle.

Every per-term contribution is quantized to integer micros
(``floor(x * 1e6 + 0.5)``) BEFORE the per-document sum, so the sum
is a BIGINT — order-independent across partitionings and engines
(float sums are not; see the streaming_hourly_counts note).  The
quantization boundary is safe cross-engine because both engines
compute the identical double from identical exact-integer inputs
with the identical parenthesization first.

Scale shape (100 TB): one column-pruned scalar pass for corpus stats
(N docs, T tokens — partial-aggregated map-side), plus the postings
subplan — explode tokens IN the scan, broadcast-join the distinct
query vocabulary immediately (only matching postings ever shuffle,
keyed ``(doc_id, term)``) — which both the tf side and the
doc-frequency aggregate now consume through ONE reused exchange
(r12: a tautological ``tf >= 1 AND dl >= 1`` filter keeps the
aggregate buffers alive in the doc-frequency branch so the two
exchanges canonicalize equal; without it per-branch column pruning
made them differ, exchange reuse could not collapse them, and the
corpus was scanned + tokenized twice.  The one-pass alternative — a
count window over the term key — has unbounded per-partition size
for stopword-like query terms, so the reused two-aggregate shape
keeps the robustness AND the single scan).  Queries, stats and df broadcast back;
the final
per-``(query_id, doc_id)`` sum is one shuffle over matched docs
only; top-k is a ``row_number() <= k`` with a LITERAL bound so the
window compiles to a map-side WindowGroupLimit — at most ``k`` rows
per input partition per query reach the (deliberately tiny,
query-count-partitioned) final exchange.  No Python anywhere.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .balance import spread_small_input
from .text import tokens


def _queries_frame(
    docs: DataFrame,
    queries: DataFrame | Mapping[str, Sequence[str]],
    lowercase: bool,
) -> DataFrame:
    """Normalize the query set to a (query_id, term) DataFrame —
    duplicate terms within a query collapse (set semantics; BM25's
    qtf refinement is out of scope for a curation screen).  When the
    corpus side folds case, the query terms fold WITH it — otherwise
    a mixed-case term could never match anything and the query would
    silently shrink."""
    if isinstance(queries, DataFrame):
        q = queries.select("query_id", "term")
    else:
        rows = [
            (qid, t) for qid, terms in queries.items() for t in set(terms)
        ]
        q = docs.sparkSession.createDataFrame(
            rows, "query_id string, term string"
        )
    if lowercase:
        q = q.select("query_id", F.lower(F.col("term")).alias("term"))
    return q.distinct()


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame | Mapping[str, Sequence[str]],
    k: int = 10,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    k1_tenths: int = 12,
    b_hundredths: int = 75,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query by (log-free) Okapi BM25.

    ``score(q, d) = Σ_{t ∈ q}  idf(t) · sat(t, d)`` with

    - ``idf(t)   = (2N − 2·df(t) + 1) / (2·df(t) + 1)`` — the RSJ idf
      argument, numerator/denominator pre-scaled by 2 so both are
      exact integers (see the module docstring for why no log), and
    - ``sat(t,d) = tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)``,
      the standard saturation term, evaluated as the exact-integer
      ratio ``(tf · C_num · T) / (1000·T·tf + C_lin·T + C_quad·dl·N)``
      where ``T`` is total corpus tokens, ``N`` the document count,
      ``dl`` the document length, and the ``C_*`` constants absorb
      the rational parameters ``k1 = k1_tenths/10``,
      ``b = b_hundredths/100`` (defaults: the standard 1.2 / 0.75).

    Each term's contribution is floored to integer micros before the
    per-document sum (order-independent BIGINT); ties break on
    ``doc_id``.  Documents matching no query term are absent (OR
    semantics); queries none of whose terms occur in the corpus are
    absent.  Returns ``(query_id, doc_id, score_micros, rnk)``.
    """
    if k < 1:
        raise ValueError("bm25_topk: k must be >= 1")
    if k1_tenths < 0 or not 0 <= b_hundredths <= 100:
        raise ValueError(
            "bm25_topk: need k1_tenths >= 0 and 0 <= b_hundredths <= 100"
        )
    qterms = F.broadcast(_queries_frame(docs, queries, lowercase))
    vocab = F.broadcast(qterms.select("term").distinct())

    tok_expr: Column = tokens(
        F.lower(F.col(text)) if lowercase else F.col(text)
    )
    base = spread_small_input(docs.select(F.col(id_col), F.col(text)))

    # scalar stats pass: column-pruned, partial-aggregated map-side
    stats = base.select(tok_expr.alias("_toks")).agg(
        F.count("*").alias("_n"),
        F.sum(F.size("_toks")).alias("_t"),
    )

    # postings pass: tokenize ONCE under a materialized alias (the
    # token_count_of idiom — size() and explode() land in different
    # physical operators, where an inline split would run twice per
    # row), explode in the scan, keep only query-vocabulary terms
    # (broadcast hash join on the distinct term set — no row
    # multiplication), then one (doc, term) shuffle sized by MATCHED
    # postings only
    # explode_OUTER on purpose: plain explode makes Catalyst infer a
    # `size(toks) > 0 AND isnotnull(toks)` filter that pushes below
    # the projection and INLINES the split — measured 3 regex splits
    # per row instead of 1; the outer variant infers nothing, and its
    # null-term placeholder rows vanish in the inner vocab join
    posts = (
        base.select(F.col(id_col), tok_expr.alias("_toks"))
        .select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            F.explode_outer("_toks").alias("term"),
        )
        .join(vocab, "term")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    # r12: tautological filter (tf is a count(*) so tf >= 1 always; a
    # matched term implies the doc had a token so dl >= 1 always).
    # Its only effect is keeping tf AND dl alive through this branch's
    # partial aggregate: without it, column pruning makes the
    # doc-frequency branch's (doc, term) exchange differ from the
    # postings branch's, exchange reuse cannot collapse them, and the
    # corpus is scanned + tokenized + vocab-joined TWICE (the module
    # docstring's r11 note).  With it the two exchanges canonicalize
    # equal and AQE's stage cache executes the postings subtree once —
    # the robustness argument against the count-window alternative
    # (unbounded partition for stopword-like terms) stays intact.
    dfreq = (
        posts.filter((F.col("tf") >= 1) & (F.col("dl") >= 1))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )

    c_num = float(1000 + 100 * k1_tenths)          # 1000·(k1+1)
    c_lin = float(k1_tenths * (100 - b_hundredths))  # 1000·k1·(1−b)
    c_quad = float(k1_tenths * b_hundredths)         # 1000·k1·b
    nd = F.col("_n").cast("double")
    td = F.col("_t").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    # identical parenthesization to the oracle SQL — every input is
    # an exact integer in a double, so each op is correctly rounded
    # to the same bits in any IEEE engine
    idf = ((F.lit(2.0) * nd) - (F.lit(2.0) * dfd) + F.lit(1.0)) / (
        (F.lit(2.0) * dfd) + F.lit(1.0)
    )
    sat = ((tfd * F.lit(c_num)) * td) / (
        ((F.lit(1000.0) * td) * tfd)
        + (F.lit(c_lin) * td)
        + ((F.lit(c_quad) * dld) * nd)
    )
    contrib = F.floor(((idf * sat) * F.lit(1000000.0)) + F.lit(0.5))

    scored = (
        posts.join(qterms, "term")
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .select(
            "query_id",
            F.col(id_col),
            contrib.alias("_c"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("_c").alias("score_micros"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micros"), F.asc(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= F.lit(int(k)))
    )
