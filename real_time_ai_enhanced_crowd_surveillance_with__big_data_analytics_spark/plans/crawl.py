"""Crawl-frontier plans: URL canonicalization + frontier dedup.

``url_canonicalize`` hash-verifies the RFC 3986 §6 normalization rules
(functions/urls.py) end-to-end: both engines assemble the SAME messy
URLs from table keys (the html_extract_quality in-query pattern — the
documents table carries no URLs), each doc-family's two variants
differing only in case, explicit default port, duplicate/trailing
slashes, query-parameter order, and a fragment; the rules must
collapse every family to one canonical form.  The dup count per
canonical is the crawl-frontier "seen set" membership a 100 TB crawl
runs before fetching.

Scale shape: pure regexp/split/sort codegen per row, one
canonical-keyed window count — the only shuffle, on the dedup key
itself (exactly the shuffle a frontier dedup must do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.urls import canonical_url, url_host
from ..sources.tables import load_table


def _messy_url() -> F.Column:
    fam = F.col("doc_id") / 2
    fam = F.floor(fam).cast("long")
    var = F.col("doc_id") % 2
    https = fam % 2 == 1
    scheme = (
        F.when(https & (var == 0), F.lit("HTTPS"))
        .when(https, F.lit("https"))
        .when(var == 0, F.lit("HTTP"))
        .otherwise(F.lit("http"))
    )
    site = F.concat(F.lit("s"), (fam % 20).cast("string"))
    host = F.when(
        var == 0, F.concat(F.lit("WWW."), F.upper(site), F.lit(".Example.COM"))
    ).otherwise(F.concat(F.lit("www."), site, F.lit(".example.com")))
    port = F.when(var == 0, F.when(https, F.lit(":443")).otherwise(F.lit(":80"))).otherwise(F.lit(""))
    path = F.when(var == 0, F.concat(F.lit("/p//"), fam.cast("string"))).otherwise(
        F.concat(F.lit("/p/"), fam.cast("string"), F.lit("/"))
    )
    q = F.when(
        var == 0, F.concat(F.lit("?b=1&a="), (fam % 5).cast("string"))
    ).otherwise(F.concat(F.lit("?a="), (fam % 5).cast("string"), F.lit("&b=1")))
    frag = F.when(var == 1, F.lit("#sec")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, q, frag)


def url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, "documents", sf).select("doc_id")
    with_url = docs.select(
        "doc_id", _messy_url().alias("raw_url")
    )
    canon = with_url.select(
        "doc_id",
        "raw_url",
        canonical_url(F.col("raw_url")).alias("canonical_url"),
        url_host(F.col("raw_url")).alias("host"),
    )
    return canon.select(
        "doc_id",
        "canonical_url",
        "host",
        F.count("*")
        .over(Window.partitionBy("canonical_url"))
        .cast("long")
        .alias("n_dups"),
    )


URL_CANONICALIZE_SQL = r"""
WITH raw AS (
  SELECT doc_id,
    CASE WHEN (doc_id // 2) % 2 = 1
         THEN CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END
         ELSE CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END END
    || '://'
    || CASE WHEN doc_id % 2 = 0
            THEN 'WWW.' || upper('s' || CAST((doc_id // 2) % 20 AS VARCHAR))
                 || '.Example.COM'
            ELSE 'www.s' || CAST((doc_id // 2) % 20 AS VARCHAR)
                 || '.example.com' END
    || CASE WHEN doc_id % 2 = 0
            THEN CASE WHEN (doc_id // 2) % 2 = 1 THEN ':443' ELSE ':80' END
            ELSE '' END
    || CASE WHEN doc_id % 2 = 0
            THEN '/p//' || CAST(doc_id // 2 AS VARCHAR)
            ELSE '/p/' || CAST(doc_id // 2 AS VARCHAR) || '/' END
    || CASE WHEN doc_id % 2 = 0
            THEN '?b=1&a=' || CAST((doc_id // 2) % 5 AS VARCHAR)
            ELSE '?a=' || CAST((doc_id // 2) % 5 AS VARCHAR) || '&b=1' END
    || CASE WHEN doc_id % 2 = 1 THEN '#sec' ELSE '' END AS raw_url
  FROM documents
), parts AS (
  SELECT doc_id, raw_url,
    lower(regexp_extract(regexp_replace(raw_url, '#.*$', ''),
          '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(regexp_replace(raw_url, '#.*$', ''),
          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS authority,
    regexp_extract(regexp_replace(raw_url, '#.*$', ''),
          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
    regexp_extract(regexp_replace(raw_url, '#.*$', ''),
          '\?([^#]*)', 1) AS rawq
  FROM raw
), normed AS (
  SELECT doc_id,
    scheme,
    CASE WHEN scheme = 'http' AND authority LIKE '%:80'
         THEN substring(authority, 1, length(authority) - 3)
         WHEN scheme = 'https' AND authority LIKE '%:443'
         THEN substring(authority, 1, length(authority) - 4)
         ELSE authority END AS auth2,
    regexp_replace(rawpath, '/{2,}', '/', 'g') AS collapsed,
    rawq
  FROM parts
), pathed AS (
  SELECT doc_id, scheme, auth2,
    CASE WHEN length(p1) = 0 THEN '/' ELSE p1 END AS path,
    CASE WHEN length(rawq) = 0 THEN ''
         ELSE '?' || array_to_string(list_sort(string_split(rawq, '&')), '&')
    END AS q
  FROM (
    SELECT doc_id, scheme, auth2, rawq,
      CASE WHEN length(collapsed) > 1 AND collapsed LIKE '%/'
           THEN substring(collapsed, 1, length(collapsed) - 1)
           ELSE collapsed END AS p1
    FROM normed
  )
)
SELECT doc_id,
  scheme || '://' || auth2 || path || q AS canonical_url,
  regexp_replace(auth2, ':[0-9]+$', '') AS host,
  count(*) OVER (PARTITION BY scheme || '://' || auth2 || path || q)
    AS n_dups
FROM pathed
"""


# --- robots.txt gate (RFC 9309 longest-match) ---------------------------------


def robots_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Crawl-permission gate with RFC 9309 §2.2.2 semantics: the rule
    whose path prefix matches LONGEST wins; on an allow/disallow tie of
    equal length, allow wins; no matching rule means allowed.

    Both engines synthesize the same per-host rule set (a block-all
    host every 7th site, a /p disallow every 3rd, an /p/1 allow
    override everywhere — so the longest-match and tie rules are both
    load-bearing) and gate the canonical frontier URLs from
    ``url_canonicalize``.  Shape: the rules side is hosts × 3 rows —
    broadcast — so the gate is a map-side join plus a per-URL window
    over at most a handful of matched rules; at 100 TB the frontier
    never shuffles.
    """
    urls = (
        url_canonicalize(spark, sf)
        .select("doc_id", "canonical_url", "host")
        .withColumn(
            "path",
            F.regexp_extract("canonical_url", r"^[a-z+.-]+://[^/]*([^?#]*)", 1),
        )
    )
    hosts = urls.select("host").distinct()
    site_id = F.regexp_extract("host", r"www\.s(\d+)\.example\.com", 1).cast(
        "long"
    )
    rules = hosts.select(
        "host",
        F.filter(
            F.array(
                F.when(
                    site_id % 7 == 0,
                    F.struct(
                        F.lit("/").alias("prefix"), F.lit(False).alias("allow")
                    ),
                ),
                F.when(
                    site_id % 3 == 0,
                    F.struct(
                        F.lit("/p").alias("prefix"), F.lit(False).alias("allow")
                    ),
                ),
                F.struct(
                    F.lit("/p/1").alias("prefix"), F.lit(True).alias("allow")
                ),
                # zero-length catch-all: RFC default is allowed when no
                # rule matches; giving it the shortest prefix makes the
                # default fall out of the same longest-match window
                # (a left-join-then-filter default LOSES urls whose
                # only host rules don't prefix-match)
                F.struct(F.lit("").alias("prefix"), F.lit(True).alias("allow")),
            ),
            lambda r: r.isNotNull(),
        ).alias("rules"),
    ).select("host", F.explode("rules").alias("r"))

    matched = urls.join(F.broadcast(rules), "host").filter(
        F.col("path").startswith(F.col("r.prefix"))
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc(F.length("r.prefix")), F.desc("r.allow")
    )
    return (
        matched.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "host",
            "path",
            F.col("r.allow").alias("allowed"),
            F.col("r.prefix").alias("matched_rule"),
        )
    )


ROBOTS_GATE_SQL = f"""
WITH urls AS (
  SELECT doc_id, canonical_url, host,
         regexp_extract(canonical_url, '^[a-z+.-]+://[^/]*([^?#]*)', 1) AS path
  FROM ({URL_CANONICALIZE_SQL})
), hosts AS (
  SELECT DISTINCT host,
         CAST(regexp_extract(host, 'www\\.s(\\d+)\\.example\\.com', 1) AS BIGINT)
           AS site_id
  FROM urls
), rules AS (
  SELECT host, '/' AS prefix, FALSE AS allow FROM hosts WHERE site_id % 7 = 0
  UNION ALL
  SELECT host, '/p', FALSE FROM hosts WHERE site_id % 3 = 0
  UNION ALL
  SELECT host, '/p/1', TRUE FROM hosts
  UNION ALL
  SELECT host, '', TRUE FROM hosts
), matched AS (
  SELECT u.doc_id, u.host, u.path, r.prefix, r.allow,
         row_number() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(r.prefix) DESC, r.allow DESC
         ) AS rk
  FROM urls u JOIN rules r
    ON u.host = r.host AND u.path LIKE r.prefix || '%'
)
SELECT doc_id, host, path, allow AS allowed, prefix AS matched_rule
FROM matched WHERE rk = 1
"""


# --- per-source crawl budget apportionment ------------------------------------

CRAWL_BUDGET = 9_973  # global fetch slots per round; prime, so the
                      # largest-remainder path actually runs (a round
                      # budget divisible by the corpus total would zero
                      # every remainder and never exercise the tiebreak)


def crawl_budget_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Apportion a global fetch budget across sources proportionally to
    their document mass — Hamilton's largest-remainder method, the
    classic exact-integer apportionment (every crawl scheduler's
    per-domain pacing step): floor shares first, then the leftover
    slots go to the largest remainders (source name breaks ties), so
    ``Σ allocated = budget`` EXACTLY — no float shares to drift and no
    slot lost or invented.

    Everything is integers: floor share ``(budget·n_i) DIV N``,
    remainder ``(budget·n_i) mod N``, leftover ``budget − Σ floors``,
    one rank over the |sources| dim.

    Scale: one corpus shuffle onto the source key (partial-aggregated);
    the apportionment itself runs on the |sources|-row dim. budget·n_i
    stays BIGINT-exact below ~9e14 docs/source at this budget.
    """
    docs = load_table(spark, "documents", sf)
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    # totals come from keyless (1-row) aggregates broadcast back, and
    # the remainder rank from a bounded dim×dim self-join — no global
    # window, so nothing ever funnels the frame to one task even if
    # |sources| grows to web scale
    grand = counts.agg(F.sum("n_docs").alias("n_total"))
    shares = (
        counts.crossJoin(F.broadcast(grand))
        .withColumn("floor_share", F.expr(f"({CRAWL_BUDGET} * n_docs) DIV n_total"))
        .withColumn("remainder", F.expr(f"({CRAWL_BUDGET} * n_docs) % n_total"))
    )
    floors = shares.agg(
        (F.lit(CRAWL_BUDGET) - F.sum("floor_share")).alias("leftover")
    )
    other = shares.select(
        F.col("source").alias("o_source"), F.col("remainder").alias("o_rem")
    )
    before = (
        (F.col("o_rem") > F.col("remainder"))
        | (
            (F.col("o_rem") == F.col("remainder"))
            & (F.col("o_source") < F.col("source"))
        )
    )
    ranked = (
        shares.join(F.broadcast(other), before, "left")
        .groupBy("source", "n_docs", "floor_share", "remainder")
        .agg(F.count("o_source").alias("n_before"))
    )
    return ranked.crossJoin(F.broadcast(floors)).select(
        "source",
        "n_docs",
        "floor_share",
        "remainder",
        (
            F.col("floor_share")
            + (F.col("n_before") < F.col("leftover")).cast("long")
        ).alias("allocated"),
    )


CRAWL_BUDGET_ALLOCATION_SQL = f"""
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), base AS (
  SELECT source, n_docs,
         CAST(sum(n_docs) OVER () AS BIGINT) AS n_total
  FROM counts
), shares AS (
  SELECT source, n_docs,
         ({CRAWL_BUDGET} * n_docs) // n_total AS floor_share,
         ({CRAWL_BUDGET} * n_docs) % n_total AS remainder
  FROM base
), ranked AS (
  SELECT *,
         {CRAWL_BUDGET} - CAST(sum(floor_share) OVER () AS BIGINT) AS leftover,
         row_number() OVER (ORDER BY remainder DESC, source ASC) AS rk
  FROM shares
)
SELECT source, n_docs, floor_share, remainder,
       floor_share + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS allocated
FROM ranked
"""


CRAWL_QUERIES = {
    "crawl_budget_allocation": (
        crawl_budget_allocation,
        CRAWL_BUDGET_ALLOCATION_SQL,
    ),
    "url_canonicalize": (url_canonicalize, URL_CANONICALIZE_SQL),
    "robots_gate": (robots_gate, ROBOTS_GATE_SQL),
}
