"""SURT canonicalization + CDX(J) index parsing — the CommonCrawl
URL-index pair.

Web-archive pipelines address everything by **SURT** (Sort-friendly
URI Reordering Transform, the Heritrix/pywb convention): scheme and
userinfo dropped, host lowercased, a leading ``www.`` label stripped,
default ports (80/443) removed, host labels REVERSED and
comma-joined, then ``)`` + lowercased path, with query parameters
sorted so equivalent URLs collide. The per-crawl **CDX-JSON index**
is a text file of ``urlkey timestamp {json}`` lines. Both are pure
string work, so both stay JVM-side: the SURT builder is a single
expression tree (regexp strips, split/reverse/array_join for the
host, split/array_sort/array_join for the query), and the CDX parse
is a 3-way bounded split + ``from_json`` — zero UDFs, scan-speed at
100 TB of index lines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def surt_key(url: Column) -> Column:
    """URL → SURT urlkey (see module note). Non-default ports stay
    on the reversed host (``com,example,site:8080)/p``); an empty
    path canonicalizes to ``/``; fragments are dropped; query
    params are sorted byte-wise."""
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, r"^[^/@]*@", "")
    hostport = F.lower(F.substring_index(rest, "/", 1))
    pathq = F.lower(
        F.substring(rest, F.length(hostport) + 1, F.length(rest))
    )
    pathq = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    hostport = F.regexp_replace(hostport, r":(80|443)$", "")
    host = F.substring_index(hostport, ":", 1)
    port = F.when(
        F.contains(hostport, F.lit(":")),
        F.concat(F.lit(":"), F.substring_index(hostport, ":", -1)),
    ).otherwise(F.lit(""))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.substring_index(pathq, "?", 1)
    query = F.when(
        F.contains(pathq, F.lit("?")),
        F.concat(
            F.lit("?"),
            F.array_join(
                F.array_sort(
                    F.split(F.substring_index(pathq, "?", -1), "&")
                ),
                "&",
            ),
        ),
    ).otherwise(F.lit(""))
    return F.concat(rev, port, F.lit(")"), path, query)


def with_surt_key(
    df: DataFrame, url_col: str = "url", out_col: str = "urlkey"
) -> DataFrame:
    return df.withColumn(out_col, surt_key(F.col(url_col)))


CDXJ_FIELDS = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)


def parse_cdx_lines(
    df: DataFrame, line_col: str = "line"
) -> DataFrame:
    """CDX-JSON line → typed columns: ``urlkey timestamp {json}``
    splits with a bounded 3-way split (the JSON block may itself
    contain spaces), the JSON block parses with ``from_json`` (CDXJ
    stores numerics as strings; cast here), and the struct is
    flattened to plain columns. Malformed JSON yields nulls for the
    JSON-derived fields, never a failed task."""
    parts = F.split(F.col(line_col), " ", 3)
    j = F.from_json(parts[2], CDXJ_FIELDS)
    return df.select(
        parts[0].alias("urlkey"),
        parts[1].cast("long").alias("ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("long").alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("long").alias("length"),
        j["offset"].cast("long").alias("offset"),
        j["filename"].alias("filename"),
    )


SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField(
            "url",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("loc", T.StringType()),
                        T.StructField("lastmod", T.StringType()),
                        T.StructField("priority", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def parse_sitemap(
    df: DataFrame, xml_col: str = "xml", id_col: str = "site_id"
) -> DataFrame:
    """sitemap.xml → one row per URL entry (the sitemaps.org
    protocol): ``from_xml`` parses the ``<urlset>`` document against
    a typed schema JVM-side (Spark's built-in XML reader — no UDF),
    the entry array explodes, ``lastmod`` casts to a date and
    ``priority`` to a rounded double; absent optional tags surface
    as nulls. ``<sitemapindex>`` recursion (an index of sitemaps) is
    a fetch-loop concern, not a parse concern, and stays with the
    caller."""
    parsed = df.select(
        F.col(id_col),
        F.from_xml(F.col(xml_col), SITEMAP_SCHEMA).alias("_p"),
    )
    entry = parsed.select(
        id_col, F.explode(F.col("_p.url")).alias("_u")
    )
    return entry.select(
        id_col,
        F.col("_u.loc").alias("loc"),
        F.to_date(F.col("_u.lastmod")).alias("lastmod"),
        F.round(F.col("_u.priority").cast("double"), 4).alias(
            "priority"
        ),
    )


ANCHOR_PATTERN = r'(?is)<a\b[^>]*\bhref\s*=\s*"[^"]*"[^>]*>.*?</a>'


def extract_anchors(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Anchor (outlink) extraction — the web-graph edge builder that
    feeds pagerank/link-spam scoring and anchor-text retrieval
    corpora: one row per ``<a href="…">…</a>`` with the href, the
    visible anchor text (inner tags stripped, entities decoded,
    whitespace collapsed) and, for absolute http(s) links, the SURT
    urlkey so edges join the CDX index directly.

    Pure JVM: ``regexp_extract_all`` collects whole anchor elements,
    ``posexplode`` keeps document order, and per-element regexps
    split href from text — zero UDFs, one one-to-many Generate, no
    shuffle. Case-insensitive attribute match; single-quoted or
    bare hrefs are out of scope of the pattern (they drop, never
    error)."""
    # column-form regexp_extract_all: the pattern rides as a literal
    # Column, so its backslash classes never pass through SQL-string
    # escape processing.
    anchors = F.regexp_extract_all(
        F.col(html_col), F.lit(ANCHOR_PATTERN), F.lit(0)
    )
    rows = df.select(
        F.col(id_col),
        F.posexplode(anchors).alias("anchor_idx", "_a"),
    )
    href = F.regexp_extract(
        F.col("_a"), r'(?is)\bhref\s*=\s*"([^"]*)"', 1
    )
    inner = F.regexp_replace(
        F.col("_a"), r"(?is)^<a[^>]*>|</a>$", ""
    )
    text = F.regexp_replace(inner, r"<[^>]*>", "")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        text = F.regexp_replace(text, ent, ch)
    text = F.trim(F.regexp_replace(text, r"\s+", " "))
    return rows.select(
        F.col(id_col),
        "anchor_idx",
        href.alias("href"),
        text.alias("anchor_text"),
        F.when(
            href.rlike("^(?i)https?://"), surt_key(href)
        ).alias("urlkey"),
    )


RSS_SCHEMA = (
    "channel struct<title: string, item: array<struct<"
    "title: string, link: string, pubDate: string, "
    "description: string>>>"
)


def parse_rss(
    df: DataFrame, xml_col: str = "xml", id_col: str = "feed_id"
) -> DataFrame:
    """RSS 2.0 feed → one row per ``<item>`` (the news/blog corpus
    source format next to sitemap.xml): ``from_xml`` against a
    typed schema, item array exploded, and the RFC-822 ``pubDate``
    (``Mon, 15 Jan 2024 06:30:00 GMT``) parsed to exact epoch
    SECONDS — integer epoch is the cross-engine-stable rendering of
    a timestamp. Missing optional tags surface as nulls; malformed
    XML yields a null struct → zero rows, never a failed task."""
    parsed = df.select(
        F.col(id_col),
        F.from_xml(F.col(xml_col), RSS_SCHEMA).alias("_p"),
    )
    items = parsed.select(
        id_col,
        F.col("_p.channel.title").alias("feed_title"),
        F.posexplode(F.col("_p.channel.item")).alias("item_idx", "_i"),
    )
    return items.select(
        id_col,
        "feed_title",
        "item_idx",
        F.col("_i.title").alias("title"),
        F.col("_i.link").alias("link"),
        # Spark's (non-legacy) parser rejects day-of-week fields, so
        # the RFC-822 'Mon, ' prefix strips and the GMT/UT names map
        # to a +0000 offset parsed with 'Z' — timezone-proof (the
        # instant is absolute regardless of session tz).
        F.unix_timestamp(
            F.to_timestamp(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("_i.pubDate"), r"^[A-Za-z]{3},\s*", ""
                    ),
                    r"\s*(GMT|UT|Z)$",
                    " +0000",
                ),
                "dd MMM yyyy HH:mm:ss Z",
            )
        ).alias("pub_epoch"),
        F.length(F.col("_i.description")).cast("long")
        .alias("desc_len"),
    )


ATOM_SCHEMA = (
    "title string, entry array<struct<title: string, "
    "link: struct<_href: string>, updated: string, "
    "summary: string>>"
)


def parse_atom(
    df: DataFrame, xml_col: str = "xml", id_col: str = "feed_id"
) -> DataFrame:
    """Atom (RFC 4287) feed → one row per ``<entry>`` — the second
    syndication format next to RSS 2.0. The entry link is an
    ATTRIBUTE (``<link href="…"/>``, surfaced through Spark-XML's
    ``_``-prefixed attribute convention) and ``<updated>`` is
    ISO-8601 with a Z zone — cast straight to an absolute epoch
    second. Malformed XML → null struct → zero rows."""
    parsed = df.select(
        F.col(id_col),
        F.from_xml(F.col(xml_col), ATOM_SCHEMA).alias("_p"),
    )
    items = parsed.select(
        id_col,
        F.col("_p.title").alias("feed_title"),
        F.posexplode(F.col("_p.entry")).alias("entry_idx", "_e"),
    )
    return items.select(
        id_col,
        "feed_title",
        "entry_idx",
        F.col("_e.title").alias("title"),
        F.col("_e.link._href").alias("link"),
        F.unix_timestamp(
            F.to_timestamp(F.col("_e.updated"))
        ).alias("updated_epoch"),
        F.length(F.col("_e.summary")).cast("long").alias("summary_len"),
    )
