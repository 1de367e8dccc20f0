"""Scrubbing operators — PII redaction and URL/domain blocklist filtering,
the safety/compliance pass every web-scale training corpus runs before
assembly (operators/training.py) and after quality filtering
(operators/curation.py).

The synthetic `documents` fixture contains no organic PII or URLs, so each
op first DERIVES a deterministic contact/url column from (doc_id, text) —
same expression on both engines — and then runs the real scrub machinery
(regex redaction chains, domain extraction, broadcast anti-join against a
blocklist) over it. The derivation is fixture plumbing; the scrub logic is
the operator.

Scale notes (100 TB):
- Redaction is a pure per-row `regexp_replace` chain — map-only, zero
  shuffle, whole-stage codegen; count columns ride the same projection.
- The domain blocklist is small by construction (a curated denylist) →
  broadcast LEFT ANTI join; the corpus never shuffles. A billion-domain
  denylist would switch to a bucketed sort-merge anti-join on domain —
  the operator's join key is already the normalized domain, so only the
  join strategy changes.
- Both ops keep the text column out of every shuffle: aggregations group
  on (source) after projecting the text away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# simple, engine-portable patterns (identical semantics in Java regex /
# RE2): lowercase emails and the +1-555-XXXX synthetic phone shape
_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+\.com"
_PHONE_RE = r"\+1-555-[0-9]{4}"

# derived contact line appended to each document (both engines, same expr)
_CONTACT_SPARK = (
    "concat(text, ' Contact user', CAST(doc_id AS STRING), '@corp',"
    " CAST(doc_id % 7 AS STRING), '.com or call +1-555-',"
    " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), '.')"
)
_CONTACT_DUCK = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@corp'"
    " || CAST(doc_id % 7 AS VARCHAR) || '.com or call +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'"
)


@query(
    "pii_redact",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id, source, {_CONTACT_DUCK} AS body FROM documents
    )
    SELECT doc_id, source,
           CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS INT)
             AS n_phones,
           md5(regexp_replace(
                 regexp_replace(body, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                 '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
    FROM enriched
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails and phone numbers, reporting per-document match
    counts and an md5 of the redacted body (the hash stands in for the
    scrubbed text so the compare never ships full documents).

    Map-only regex chain — the 100 TB plan is one projection, no shuffle.
    """
    docs = load(spark, sf_dir, "documents")
    body = F.expr(_CONTACT_SPARK)
    redacted = F.regexp_replace(
        F.regexp_replace(body, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        "source",
        F.regexp_count(body, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(body, F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# curated denylist — tiny by construction, broadcast side of the anti-join
_BLOCKED_DOMAINS = tuple(f"www.site{i}.com" for i in (0, 7, 14, 21, 28, 35))


@query(
    "url_domain_blocklist",
    oracle=f"""
    WITH pages AS (
      SELECT doc_id, source, n_chars,
             'https://www.site' || CAST(doc_id % 40 AS VARCHAR)
               || '.com/p/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ),
    tagged AS (
      SELECT source, n_chars,
             regexp_extract(url, 'https://([^/]+)/', 1) AS domain
      FROM pages
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS kept_docs,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM tagged
    WHERE domain NOT IN {_BLOCKED_DOMAINS!r}
    GROUP BY source
    """,
)
def url_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop documents whose source domain is on a blocklist, then report
    surviving volume per corpus source.

    The domain is normalized out of the URL with one regex; the denylist
    joins as a broadcast LEFT ANTI (no corpus shuffle); the final rollup
    groups on the tiny `source` key.
    """
    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        "source",
        "n_chars",
        F.regexp_extract(
            F.concat(
                F.lit("https://www.site"),
                (F.col("doc_id") % 40).cast("string"),
                F.lit(".com/p/"),
                F.col("doc_id").cast("string"),
            ),
            r"https://([^/]+)/",
            1,
        ).alias("domain"),
    )
    blocked = spark.createDataFrame(
        [(d,) for d in _BLOCKED_DOMAINS], "domain string"
    )
    return (
        pages.join(F.broadcast(blocked), "domain", "left_anti")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


_KANON_K = 5  # re-identification threshold

_KANON_ORACLE = f"""
WITH q AS (
  SELECT lang, source,
         CAST(n_chars // 100 AS BIGINT) AS len_bucket,
         CAST(COUNT(*) AS BIGINT) AS grp
  FROM documents GROUP BY 1, 2, 3
)
SELECT
  CASE WHEN grp >= {_KANON_K} THEN 'k_anonymous' ELSE 'at_risk' END
    AS status,
  CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(grp) AS BIGINT) AS n_rows,
  CAST(MIN(grp) AS BIGINT) AS min_class_size
FROM q GROUP BY 1
"""


@query("privacy_k_anonymity", oracle=_KANON_ORACLE)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (lang, source,
    coarse length bucket): every equivalence class smaller than k={k}
    is a re-identification risk — the check a privacy review runs before
    releasing a dataset, and the quantitative basis for deciding which
    columns to generalize or suppress (pii_redact handles the direct
    identifiers; this catches the INDIRECT ones). Reports class and row
    counts on each side of the threshold plus the smallest class.

    Plan: one scan reduced to the quasi-identifier grid (partial agg
    absorbs map-side), then a 2-row reduction over the grid — the
    second exchange carries |classes| rows, metadata-sized at any
    corpus scale."""
    q = (
        load(spark, sf_dir, "documents")
        .groupBy(
            "lang",
            "source",
            (F.col("n_chars") / 100).cast("bigint").alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("grp"))
    )
    return q.groupBy(
        F.when(F.col("grp") >= _KANON_K, F.lit("k_anonymous"))
        .otherwise(F.lit("at_risk"))
        .alias("status")
    ).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("grp").alias("n_rows"),
        F.min("grp").alias("min_class_size"),
    )


privacy_k_anonymity.__doc__ = privacy_k_anonymity.__doc__.format(k=_KANON_K)


# Deterministic messy-URL synthesis for dedup_url_canonicalize: four
# surface variants per canonical target, keyed by doc_id % 4 — uppercase
# scheme/host + default port, trailing slash, utm_* tracking params, and
# a fragment. Shared string so Spark and the oracle build byte-identical
# inputs.
_URL_MESSY_CASES = (
    "CASE CAST({d} % 4 AS INT)"
    " WHEN 0 THEN 'https://' || {s} || '.example.com/docs/'"
    "   || CAST({d} % 8 AS {vc}) || '?lang=' || {l}"
    " WHEN 1 THEN 'HTTPS://' || upper({s}) || '.Example.COM:443/docs/'"
    "   || CAST({d} % 8 AS {vc}) || '/?lang=' || {l}"
    " WHEN 2 THEN 'https://' || {s} || '.example.com/docs/'"
    "   || CAST({d} % 8 AS {vc}) || '?utm_source=feed&lang=' || {l}"
    "   || '#sec2'"
    " ELSE 'https://' || {s} || '.example.com/docs/'"
    "   || CAST({d} % 8 AS {vc}) || '/?lang=' || {l}"
    "   || '&utm_campaign=x' END"
)

def canonicalize_urls(df: DataFrame) -> DataFrame:
    """Append `canonical_url` derived from a `url` column: strip the
    fragment, lowercase scheme+host and drop the default :443 port,
    strip trailing slashes from the path, and remove utm_* params while
    preserving remaining param order. Pure RE2-safe codegen (no
    lookaround) — the property suite pins idempotence
    (canonicalize(canonicalize(u)) == canonicalize(u)) on random messy
    URLs."""
    c = df.withColumn(
        "nofrag", F.expr("regexp_replace(url, '#.*$', '')")
    ).withColumn(
        "sh",
        F.expr(
            "regexp_replace(lower(regexp_extract(nofrag,"
            " '^[A-Za-z]+://[^/?#]+', 0)), ':443$', '')"
        ),
    ).withColumn(
        "rest",
        F.expr(
            "substr(nofrag, length(regexp_extract(nofrag,"
            " '^[A-Za-z]+://[^/?#]+', 0)) + 1)"
        ),
    ).withColumn(
        "pth",
        F.expr(
            "regexp_replace(regexp_extract(rest, '^[^?]*', 0), '/+$', '')"
        ),
    ).withColumn(
        "kept",
        F.expr(
            "CASE WHEN instr(rest, '?') > 0"
            " THEN filter(split(substr(rest, instr(rest, '?') + 1), '&'),"
            "             p -> NOT startswith(p, 'utm_'))"
            " ELSE CAST(array() AS ARRAY<STRING>) END"
        ),
    ).withColumn(
        "canonical_url",
        F.expr(
            "sh || pth || CASE WHEN size(kept) > 0"
            " THEN '?' || array_join(kept, '&') ELSE '' END"
        ),
    )
    return c.drop("nofrag", "sh", "rest", "pth", "kept")


@query(
    "dedup_url_canonicalize",
    oracle=f"""
    WITH u AS (
      SELECT doc_id,
             {_URL_MESSY_CASES.format(d="doc_id", s="source", l="lang", vc="VARCHAR")}
               AS url
      FROM documents
    ),
    c AS (
      SELECT doc_id, url,
             regexp_replace(url, '#.*$', '') AS nofrag,
             regexp_replace(lower(regexp_extract(
               regexp_replace(url, '#.*$', ''),
               '^[A-Za-z]+://[^/?#]+', 0)), ':443$', '') AS sh,
             substr(regexp_replace(url, '#.*$', ''),
               length(regexp_extract(regexp_replace(url, '#.*$', ''),
                 '^[A-Za-z]+://[^/?#]+', 0)) + 1) AS rest
      FROM u
    ),
    k AS (
      SELECT doc_id, sh,
             regexp_replace(regexp_extract(rest, '^[^?]*', 0),
               '/+$', '') AS pth,
             CASE WHEN strpos(rest, '?') > 0
                  THEN list_filter(string_split(
                         substr(rest, strpos(rest, '?') + 1), '&'),
                         p -> NOT starts_with(p, 'utm_'))
                  ELSE [] END AS kept
      FROM c
    ),
    canon AS (
      SELECT doc_id,
             sh || pth || CASE WHEN len(kept) > 0
               THEN '?' || array_to_string(kept, '&') ELSE '' END
               AS canonical_url
      FROM k
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc
    FROM canon
    GROUP BY canonical_url
    HAVING COUNT(*) >= 2
    """,
)
def dedup_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the first dedup pass of every
    web-crawl corpus (before any content hashing): normalize each
    document's URL (strip fragments, lowercase scheme+host, drop the
    default :443 port, strip trailing slashes, remove utm_* tracking
    params while preserving the remaining param order) and group by the
    canonical form; groups of >= 2 are re-crawls of the same resource,
    keep_doc (min doc_id) the canonical copy. URLs are synthesized
    deterministically from the documents table in four messy surface
    variants so the oracle builds byte-identical inputs and the
    canonicalizer provably collapses all four.

    Scale shape: canonicalization is a pure codegen regex/array chain
    (RE2-safe patterns, no lookaround, so the same regex runs on both
    engines); the ONLY shuffle is the groupBy on the canonical key —
    exact-dedup shape, same as dedup_exact's digest groupBy. No text,
    no joins, linear at any corpus size."""
    u = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            _URL_MESSY_CASES.format(d="doc_id", s="source", l="lang", vc="STRING")
        ).alias("url"),
    )
    canon = canonicalize_urls(u).select("doc_id", "canonical_url")
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------- html

# the derived HTML wrapper (fixture plumbing, same expression both
# engines): headline tag, body paragraph, a script block that must be
# dropped WITH its content, and entities that must decode
_HTML_SPARK = (
    "concat('<html><body><h1>', source, '</h1><p>', text,"
    " ' &amp; more &lt;stuff&gt;</p>',"
    " '<script>var x = ', CAST(doc_id AS STRING), ';</script>',"
    " '</body></html>')"
)
_HTML_SQL = (
    "'<html><body><h1>' || source || '</h1><p>' || text ||"
    " ' &amp; more &lt;stuff&gt;</p>' ||"
    " '<script>var x = ' || CAST(doc_id AS VARCHAR) || ';</script>' ||"
    " '</body></html>'"
)


@query(
    "fn_html_strip",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_HTML_SQL} AS html FROM documents),
    s AS (
      SELECT doc_id, html,
             regexp_replace(
               regexp_replace(html, '<script>.*?</script>', ' ', 'g'),
               '<[^>]+>', ' ', 'g') AS detagged
      FROM h
    )
    SELECT doc_id,
           trim(regexp_replace(
             replace(replace(replace(detagged,
               '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
             ' +', ' ', 'g')) AS cleaned,
           CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT)
             AS n_tags
    FROM s
    """,
)
def fn_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate stripping — the first transform every web-crawl
    corpus runs (the WET-extraction step of a Common-Crawl-style
    pipeline): drop <script> blocks WITH their payload, strip remaining
    tags, decode the basic entities, collapse whitespace. The fixture has
    no organic HTML, so the wrapper is derived deterministically from
    (source, text, doc_id) — same expression in both engines (this
    module's standard plumbing pattern); the strip chain is the operator.

    Engine-portability is the design constraint: every pattern here runs
    identically under Java regex (Spark) and RE2 (DuckDB) — non-greedy
    `.*?` for the script payload, `<[^>]+>` for tags, no lookaround
    anywhere (RE2 has none — the dedup_url_canonicalize rule). Map-only,
    zero shuffle, whole-stage codegen; n_tags rides the same projection
    via regexp_count as the audit column."""
    h = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_HTML_SPARK).alias("html")
    )
    detagged = F.regexp_replace(
        F.regexp_replace(F.col("html"), "<script>.*?</script>", " "),
        "<[^>]+>",
        " ",
    )
    decoded = F.replace(
        F.replace(
            F.replace(detagged, F.lit("&amp;"), F.lit("&")),
            F.lit("&lt;"),
            F.lit("<"),
        ),
        F.lit("&gt;"),
        F.lit(">"),
    )
    return h.select(
        "doc_id",
        F.trim(F.regexp_replace(decoded, " +", " ")).alias("cleaned"),
        F.expr("regexp_count(html, '<[^>]+>')")
        .cast("bigint")
        .alias("n_tags"),
    )


_LDIV_L = 3  # minimum sensitive-value diversity per class

_LDIV_ORACLE = f"""
WITH q AS (
  SELECT source,
         CAST(n_chars // 100 AS BIGINT) AS len_bucket,
         CAST(COUNT(*) AS BIGINT) AS grp,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS div
  FROM documents GROUP BY 1, 2
)
SELECT
  CASE WHEN div >= {_LDIV_L} THEN 'l_diverse' ELSE 'at_risk' END
    AS status,
  CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(grp) AS BIGINT) AS n_rows,
  CAST(MIN(div) AS BIGINT) AS min_diversity
FROM q GROUP BY 1
"""


@query("privacy_l_diversity", oracle=_LDIV_ORACLE)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    necessary complement: a class can be large (k-anonymous) yet leak the
    sensitive attribute outright if every member SHARES it (the
    homogeneity attack). Here the quasi-identifier is (source, coarse
    length bucket) and the sensitive attribute is lang; a class passes
    when it contains >= l={l} distinct sensitive values.

    Same two-level shape as privacy_k_anonymity: one corpus scan reduced
    to the quasi-identifier grid — the COUNT(DISTINCT lang) rides the
    same aggregate as the class size (one Expand, bounded by the grid,
    not the corpus) — then a 2-row reduction over the grid."""
    q = (
        load(spark, sf_dir, "documents")
        .groupBy(
            "source",
            (F.col("n_chars") / 100).cast("bigint").alias("len_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("grp"),
            F.countDistinct("lang").alias("div"),
        )
    )
    return q.groupBy(
        F.when(F.col("div") >= _LDIV_L, F.lit("l_diverse"))
        .otherwise(F.lit("at_risk"))
        .alias("status")
    ).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("grp").alias("n_rows"),
        F.min("div").alias("min_diversity"),
    )


privacy_l_diversity.__doc__ = privacy_l_diversity.__doc__.format(l=_LDIV_L)


# ---------------------------------------------------------------------------
# Differentially-private counts (discrete two-sided geometric mechanism)

_DP_EPSILON = 1.0
_DP_TABLE_N = 1024


def _dp_inverse_cdf_table(epsilon: float, n: int) -> list[int]:
    """Inverse CDF of the discrete Laplace (two-sided geometric)
    distribution P(z) = (1-a)/(1+a) * a^|z|, a = e^-epsilon, tabulated at
    the n bucket midpoints (u + 0.5)/n. Built once in Python and inlined
    as integer LITERALS in both engines — the NDCG-discounts device: the
    exp/log math never runs engine-side, so the noise draw is an exact
    integer table lookup."""
    import math

    a = math.exp(-epsilon)
    out = []
    for u in range(n):
        p = (u + 0.5) / n
        if p < 0.5:
            # F(z) = a^(-z)/(1+a) for z < 0: smallest z with F(z) >= p
            z = math.floor(math.log(p * (1 + a)) / math.log(a))
            out.append(-abs(int(z)))
        else:
            # F(z) = 1 - a^(z+1)/(1+a) for z >= 0
            q = (1 - p) * (1 + a)
            z = math.ceil(math.log(q) / math.log(a)) - 1
            out.append(max(0, int(z)))
    # exactness audit: each entry must be the true quantile (smallest z
    # with CDF(z) >= p) — guards libm edge cases at bucket boundaries
    def _cdf(z: int) -> float:
        return a ** (-z) / (1 + a) if z < 0 else 1 - a ** (z + 1) / (1 + a)

    for u, z in enumerate(out):
        p = (u + 0.5) / n
        assert _cdf(z) >= p > _cdf(z - 1), (u, z)
    return out


_DP_TABLE = _dp_inverse_cdf_table(_DP_EPSILON, _DP_TABLE_N)
# sanity: symmetric-ish, centered at 0
assert _DP_TABLE[_DP_TABLE_N // 2] == 0 and _DP_TABLE[0] < 0


_DP_ORACLE = f"""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM events GROUP BY event_type
),
t AS (SELECT {list(_DP_TABLE)}::BIGINT[] AS tab)
SELECT event_type, true_n,
       tab[CAST(CAST(('0x' || substring(md5('dp:' || event_type), 1, 8))
                AS BIGINT) % {_DP_TABLE_N} + 1 AS INT)] AS noise,
       GREATEST(CAST(0 AS BIGINT),
         true_n + tab[CAST(CAST(('0x' || substring(md5('dp:' || event_type),
                1, 8)) AS BIGINT) % {_DP_TABLE_N} + 1 AS INT)]) AS noisy_n,
       {_DP_EPSILON} AS epsilon
FROM g, t
"""


@query("privacy_dp_counts", oracle=_DP_ORACLE)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private group counts via the discrete two-sided
    geometric mechanism (Ghosh-Roughgarden-Sundararajan 2012 — the
    integer-valued Laplace for counting queries, epsilon={eps}): the
    third privacy-audit member next to k-anonymity and l-diversity,
    covering the RELEASE side — what a team publishes when the exact
    per-group counts themselves are sensitive.

    Mechanics: the inverse CDF of the noise distribution is tabulated at
    {n} bucket midpoints in Python and inlined as integer literals in
    both engines (the precomputed-discounts device), and each group
    draws its bucket from the library's md5-h32 hash of the group key —
    so the draw is an exact integer lookup, deterministic and
    replayable across engines, runs, and partitionings. A production
    release would swap the hash draw for a true RNG (one draw per
    OUTPUT group — metadata-sized, driver-side, never per-row) and drop
    the true_n column; it is emitted here because the row is also the
    mechanism's audit (noise must equal table[h(key)]). Post-processing
    clamps negatives to zero (DP survives post-processing). Plan: one
    partial-aggregated groupBy; the noise attach is a literal-array
    lookup projection."""
    g = load(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    # ONE parsed expression for the 1024-entry literal table: the
    # per-element F.array(*[F.lit(z).cast(...)]) form cost 1024 py4j
    # round trips ≈ 2.3-3.2 s of driver-side construction per call
    # (measured; execution itself is 0.2 s) — guide §5, the driver
    # should do almost no work. Same folded literal array either way.
    tab = F.expr(
        "array(" + ",".join(f"{z}L" for z in _DP_TABLE) + ")"
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % _DP_TABLE_N
    )
    noisy = g.withColumn("noise", F.element_at(tab, (bucket + 1).cast("int")))
    return noisy.select(
        "event_type",
        "true_n",
        "noise",
        F.greatest(F.lit(0).cast("bigint"), F.col("true_n") + F.col("noise"))
        .alias("noisy_n"),
        F.lit(_DP_EPSILON).alias("epsilon"),
    )


privacy_dp_counts.__doc__ = privacy_dp_counts.__doc__.format(
    eps=_DP_EPSILON, n=_DP_TABLE_N
)


_TCLOSE_T_MICRO = 200_000  # release threshold: TVD <= 0.2


_TCLOSE_ORACLE = f"""
WITH cl AS (
  SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket, lang,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2, 3
),
cls AS (
  SELECT source, len_bucket, SUM(n) AS nc
  FROM cl GROUP BY 1, 2
),
gl AS (SELECT lang, SUM(n) AS g FROM cl GROUP BY 1),
tot AS (SELECT SUM(n) AS gt FROM cl),
grid AS (
  SELECT c.source, c.len_bucket, c.nc, gl.lang, gl.g, tot.gt,
         COALESCE(cl.n, 0) AS n
  FROM cls c CROSS JOIN gl CROSS JOIN tot
  LEFT JOIN cl ON cl.source = c.source AND cl.len_bucket = c.len_bucket
              AND cl.lang = gl.lang
)
SELECT source, len_bucket,
       CAST(MAX(nc) AS BIGINT) AS n_rows,
       CAST((SUM(abs(n * gt - g * nc)) * 1000000)
            // (2 * MAX(nc) * MAX(gt)) AS BIGINT) AS tvd_micro,
       CASE WHEN (SUM(abs(n * gt - g * nc)) * 1000000)
                 // (2 * MAX(nc) * MAX(gt)) <= {_TCLOSE_T_MICRO}
            THEN 't_close' ELSE 'at_risk' END AS status
FROM grid GROUP BY source, len_bucket
"""


@query("privacy_t_closeness", oracle=_TCLOSE_ORACLE)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al., ICDE 2007) — completes the release
    trio: k-anonymity bounds class SIZE, l-diversity bounds sensitive
    VARIETY, t-closeness bounds sensitive SKEW — a class can be large
    and diverse yet still leak (90% one lang vs 20% globally reveals
    belief). Per quasi-identifier class (source, length bucket), the
    total-variation distance between the class's lang distribution and
    the global one, in exact micro units:
    TVD = Σ|n_i·G - g_i·N_c| / (2·N_c·G) — cross-multiplied so both
    engines divide exact integers once (the eval-family DIV device).

    Plan: one scan to the (class, lang) cell grid; the class totals,
    global lang totals, and grand total are grid-sized re-aggregations;
    the zero-fill grid is |classes|×|langs| — all metadata-sized. The
    cross-multiplied numerator stays in BIGINT while n_i·G < 9.2e18
    (~3e9 rows at 1e9-row classes); past that pre-divide to per-million
    shares per side, same grid shape.
    """
    d = load(spark, sf_dir, "documents")
    cl = d.groupBy(
        "source",
        F.expr("CAST(n_chars DIV 100 AS BIGINT)").alias("len_bucket"),
        "lang",
    ).agg(F.count(F.lit(1)).alias("n"))
    # the cell grid feeds four consumers (class totals, lang totals,
    # grand total, zero-fill join) — materialize the metadata-sized
    # relation once so the corpus is scanned ONCE (plan-pinned)
    cl = cl.localCheckpoint()
    cls = cl.groupBy("source", "len_bucket").agg(F.sum("n").alias("nc"))
    gl = cl.groupBy("lang").agg(F.sum("n").alias("g"))
    tot = cl.agg(F.sum("n").alias("gt"))
    grid = (
        cls.crossJoin(F.broadcast(gl))
        .crossJoin(F.broadcast(tot))
        .join(cl, ["source", "len_bucket", "lang"], "left")
        .select(
            "source",
            "len_bucket",
            "nc",
            "g",
            "gt",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    out = grid.groupBy("source", "len_bucket").agg(
        F.max("nc").cast("bigint").alias("n_rows"),
        F.expr(
            "CAST((SUM(abs(n * gt - g * nc)) * 1000000)"
            " DIV (2 * MAX(nc) * MAX(gt)) AS BIGINT)"
        ).alias("tvd_micro"),
    )
    return out.withColumn(
        "status",
        F.when(
            F.col("tvd_micro") <= _TCLOSE_T_MICRO, F.lit("t_close")
        ).otherwise(F.lit("at_risk")),
    )


# ------------------------------------------ DP quantile (exp. mechanism)

_DPQ_EPS = 0.5
_DPQ_B = 64  # candidate bins over o_totalprice
_DPQ_LO, _DPQ_W = 0.0, 10_000.0  # covers [0, 640k); edges clamp

_DPQ_ORACLE = f"""
WITH binned AS (
  SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - {_DPQ_LO}) / {_DPQ_W}),
              0), {_DPQ_B - 1}) AS INT) AS b
  FROM orders
),
cnt AS (
  SELECT g.b, COALESCE(c.n, 0) AS n FROM
    (SELECT unnest(range({_DPQ_B})) AS b) g
  LEFT JOIN (SELECT b, CAST(COUNT(*) AS BIGINT) AS n
             FROM binned GROUP BY b) c ON g.b = c.b
),
w AS (
  SELECT b, n,
         SUM(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) - n AS cbefore,
         (SELECT SUM(n) FROM cnt) AS total_n
  FROM cnt
),
wt AS (
  SELECT b,
         CAST(ROUND(exp(-{_DPQ_EPS} * GREATEST(0,
                  total_n - 2 * (cbefore + n),
                  2 * cbefore - total_n)
                        / 4.0) * 1e9) AS HUGEINT) AS wm
  FROM w
),
cum AS (
  SELECT b, wm,
         SUM(wm) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cw,
         (SELECT SUM(wm) FROM wt) AS tw
  FROM wt
),
draw AS (
  SELECT CAST(('0x' || substring(md5('dpq:median:v1'), 1, 8)) AS BIGINT)
         AS u32
),
sel AS (
  SELECT MIN(b) AS sel_b FROM cum, draw
  WHERE cw > (CAST(u32 AS HUGEINT) * tw) // 4294967296
)
SELECT CAST(sel_b AS INT) AS dp_bin,
       ROUND({_DPQ_LO} + (sel_b + 0.5) * {_DPQ_W}, 4) AS dp_median,
       ROUND((SELECT quantile_cont(o_totalprice, 0.5) FROM orders), 4)
         AS true_median,
       {_DPQ_EPS} AS epsilon,
       (SELECT CAST(SUM(n) AS BIGINT) FROM cnt) AS n
FROM sel
"""


@query("privacy_dp_quantile", oracle=_DPQ_ORACLE)
def privacy_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private MEDIAN via the exponential mechanism
    (McSherry-Talwar 2007) over a fixed candidate-bin grid — the release
    mechanism for a sensitive VALUE statistic, completing the privacy
    family's release side next to privacy_dp_counts' count mechanism:
    bin b's utility is the (integer, doubled-to-stay-integer) rank
    distance from its INTERVAL to the median — 0 when the bin contains
    the median, else the doubled rank gap to the nearer edge
    (GREATEST(0, n - 2*(c_before + n_b), 2*c_before - n)) — and b is selected with probability proportional to
    exp(-eps * d / 4) (rank sensitivity 2 in the doubled units).

    Engine-exact selection, the dp_counts playbook extended from a
    lookup table to a data-dependent distribution: each bin's weight is
    the SINGLE-ROUNDED integer nano-weight ROUND(exp(.)*1e9), the
    cumulative-weight scan and the threshold compare are pure integer
    arithmetic (the u32*total product runs in DECIMAL(38,0)/HUGEINT —
    it overflows BIGINT), and the 'draw' is the library's md5-h32 of a
    fixed seed string, so both engines select the identical bin. A
    production release swaps the seeded draw for one true RNG draw
    (1 per released statistic, driver-side); true_median is emitted as
    the audit column, exactly like dp_counts' true_n.

    Scale: one partial-aggregated groupBy onto the {b}-bin grid; every
    window below runs on the {b}-row grid (grid-first rule), so the
    mechanism's cost is the histogram scan, independent of n."""
    o = load(spark, sf_dir, "orders")
    b = (
        F.least(
            F.greatest(
                F.floor((F.col("o_totalprice") - _DPQ_LO) / _DPQ_W), F.lit(0)
            ),
            F.lit(_DPQ_B - 1),
        )
        .cast("int")
        .alias("b")
    )
    grid = spark.range(_DPQ_B).select(F.col("id").cast("int").alias("b"))
    cnt = (
        grid.join(
            o.select(b).groupBy("b").agg(F.count(F.lit(1)).alias("n0")),
            "b",
            "left",
        )
        .select("b", F.coalesce("n0", F.lit(0)).cast("bigint").alias("n"))
    )
    wspec = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    w = cnt.select(
        "b",
        "n",
        (F.sum("n").over(wspec) - F.col("n")).alias("cbefore"),
        F.sum("n").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total_n"),
    )
    wt = w.select(
        "b",
        # interval rank distance: 0 when the bin CONTAINS the median
        # (cbefore <= n/2 <= cbefore + n_b, in doubled units), else the
        # doubled rank gap to the nearer bin edge — the midrank-distance
        # first draft was never 0, so every nano-weight rounded to zero
        # and selection returned NULL on BOTH engines (the oracle agreed
        # with the bug; tests/test_dp_quantile.py pins non-null now)
        F.expr(
            f"CAST(ROUND(exp(-{_DPQ_EPS} * GREATEST(0,"
            " total_n - 2 * (cbefore + n), 2 * cbefore - total_n)"
            " / 4.0) * 1e9) AS DECIMAL(38,0))"
        ).alias("wm"),
    )
    cum = wt.select(
        "b",
        F.sum("wm").over(wspec).alias("cw"),
        F.sum("wm").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tw"),
    )
    u32 = F.conv(
        F.substring(F.md5(F.lit("dpq:median:v1")), 1, 8), 16, 10
    ).cast("bigint")
    sel = (
        cum.withColumn("u32", u32)
        .filter(
            F.col("cw")
            > F.expr("CAST(u32 AS DECIMAL(38,0)) * tw DIV 4294967296")
        )
        .agg(F.min("b").alias("sel_b"))
    )
    truem = o.agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias(
            "true_median"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return sel.crossJoin(F.broadcast(truem)).select(
        F.col("sel_b").cast("int").alias("dp_bin"),
        F.round(_DPQ_LO + (F.col("sel_b") + 0.5) * _DPQ_W, 4).alias(
            "dp_median"
        ),
        "true_median",
        F.lit(_DPQ_EPS).alias("epsilon"),
        "n",
    )


privacy_dp_quantile.__doc__ = privacy_dp_quantile.__doc__.format(b=_DPQ_B)
