"""robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol).

A compliant web-corpus pipeline filters its URL frontier against each
host's robots rules BEFORE fetching; at crawl scale this is a join of
billions of URLs against a small per-domain rule table — exactly the
broadcast-hash-join shape Spark is best at, so the whole evaluator
stays JVM-side (zero UDFs):

- **Rule → LIKE pattern, not regex** (`_rule_pattern`): RFC 9309
  rules are path prefixes with ``*`` (any run) and a final ``$``
  (end anchor). That grammar maps 1:1 onto SQL ``LIKE`` — escape
  ``%``/``_``/``\\``, turn ``*`` into ``%``, and append a trailing
  ``%`` unless the rule ends in ``$`` — which keeps the match
  whole-stage-codegen'd AND gives the DuckDB oracle byte-identical
  semantics (``LIKE … ESCAPE '\\'``), where Java-vs-RE2 regex
  dialects would drift.
- **Longest-match precedence** (RFC 9309 §2.2.2): among matching
  rules the most specific (longest octet length) wins; on a tie the
  least restrictive (Allow) wins. One row_number window per URL,
  ordered (rule_len DESC, is_allow DESC, rule ASC final tiebreak for
  determinism).
- **Default allow**: a URL matching no rule is crawlable — left
  join + coalesce, so unmatched URLs never drop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rule_pattern(rule: Column) -> Column:
    """RFC 9309 rule → SQL LIKE pattern (see module note)."""
    p = F.replace(rule, F.lit("\\"), F.lit("\\\\"))
    p = F.replace(p, F.lit("%"), F.lit("\\%"))
    p = F.replace(p, F.lit("_"), F.lit("\\_"))
    p = F.replace(p, F.lit("*"), F.lit("%"))
    return F.when(
        F.endswith(p, F.lit("$")), F.regexp_replace(p, r"\$$", "")
    ).otherwise(F.concat(p, F.lit("%")))


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_id_col: str = "url_id",
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Evaluate every URL against its domain's robots rules.

    ``urls``: (url_id, domain, path); ``rules``: (domain, is_allow
    boolean, rule string — RFC 9309 path pattern). Returns one row
    per URL: ``allowed`` + the winning ``rule`` (null when no rule
    matched → default allow). The rule table is broadcast (robots
    files are KB-scale per domain; at 100 TB of frontier the join
    stays map-side), the LIKE match runs in codegen, and the
    precedence window shuffles only (url, matched-rule) pairs."""
    pat = rules.select(
        F.col(domain_col).alias("_r_domain"),
        F.col("is_allow"),
        F.col("rule"),
        F.length("rule").alias("_rule_len"),
        _rule_pattern(F.col("rule")).alias("_pattern"),
    )
    joined = urls.join(
        F.broadcast(pat),
        (F.col(domain_col) == F.col("_r_domain"))
        & F.expr(f"{path_col} LIKE _pattern ESCAPE '\\\\'"),
        "left",
    )
    w = (
        Window.partitionBy(url_id_col)
        .orderBy(
            F.col("_rule_len").desc_nulls_last(),
            F.col("is_allow").desc_nulls_last(),
            F.col("rule").asc_nulls_last(),
        )
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            url_id_col,
            domain_col,
            path_col,
            F.coalesce(F.col("is_allow"), F.lit(True)).alias("allowed"),
            F.col("rule"),
        )
    )


def parse_robots_txt(df: DataFrame, text_col: str = "robots_txt",
                     domain_col: str = "domain") -> DataFrame:
    """Parse raw robots.txt bodies into the (domain, is_allow, rule)
    table :func:`robots_filter` consumes — the `*` user-agent group
    only (a production crawler picks its agent group first; group
    selection is the same split/filter shape). Pure JVM splits:
    explode lines, trim comments, keep Allow/Disallow directives
    with non-empty values."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    parsed = lines.select(
        "domain",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    return (
        parsed.select(
            "domain",
            F.lower(F.trim(F.substring_index("line", ":", 1))).alias(
                "directive"
            ),
            F.trim(
                F.expr("substring(line, instr(line, ':') + 1)")
            ).alias("rule"),
        )
        .where(F.col("directive").isin("allow", "disallow"))
        .where(F.col("rule") != "")
        .select(
            "domain",
            (F.col("directive") == "allow").alias("is_allow"),
            "rule",
        )
    )
