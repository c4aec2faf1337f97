"""URL fuzzing rules — crawl-rule link generation as a DataFrame op.

Reference: ``FuzzURL`` (/root/reference/pkg/crawler/fuzzing_rules.go:28-108):
for each CrawlingRule, (a) if the URL has a query string, every fuzzing
parameter named ``query`` sets ``selector=value`` for each value in the
rule's value list; (b) every ``path`` target replaces the FIRST
occurrence of the selector inside the URL path with each value.
Generated URLs feed back into the frontier.

Spark rendering: rules live in a small broadcast table; generation is a
broadcast join + per-value explode — entirely JVM-side string surgery,
no Python. Documented divergence: Go's ``url.Values.Encode`` re-sorts
query keys alphabetically; we splice in place (identical when the
fuzzed key is already present or the query has one key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

#: rules schema: rule_name, param_name ('query'|'path'), selector, values array
RULES_SCHEMA = "rule_name string, param_name string, selector string, fuzz_values array<string>"


def fuzz_urls(urls: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Generate fuzzed URLs per rule; output (url, rule_name, fuzz_value,
    fuzzed_url), one row per (input URL × rule × value) that applies.

    Query fuzz applies only to URLs that already carry a query string
    (fuzzing_rules.go:43-63); path fuzz only where the selector occurs
    (first occurrence replaced, :66-88).
    """
    if url_col != "url":
        urls = urls.withColumnRenamed(url_col, "url")
    u = F.col("url")
    r = broadcast(rules).withColumn("fuzz_value", F.explode("fuzz_values")).drop("fuzz_values")
    joined = urls.crossJoin(r)

    sel, val = F.col("selector"), F.col("fuzz_value")
    has_query = u.contains("?")
    base = F.substring_index(u, "?", 1)
    query = F.expr("substring_index(url, '?', -1)")

    # selectors/values are LITERAL strings (the Go reference manipulates
    # url.Values / strings.Replace, never regex): quote the selector with
    # \Q..\E in patterns and escape '\' and '$' in replacements so
    # metacharacter-bearing rules ('ids[]', '$ref') cannot crash the job
    sel_q = F.concat(F.lit(r"\Q"), sel, F.lit(r"\E"))
    val_repl = F.regexp_replace(val, r"([\\$])", r"\\$1")
    sel_repl = F.regexp_replace(sel, r"([\\$])", r"\\$1")  # selector in replacement position too

    # query fuzz: rewrite `sel=...` if present (up to next & or end), else append
    param_re = F.concat(F.lit("(^|&)"), sel_q, F.lit("=[^&]*"))
    has_param = F.regexp_count(query, param_re) > 0
    new_query = F.when(
        has_param,
        F.regexp_replace(query, param_re, F.concat(F.lit("$1"), sel_repl, F.lit("="), val_repl)),
    ).otherwise(F.concat(query, F.lit("&"), sel, F.lit("="), val))
    query_fuzzed = F.concat(base, F.lit("?"), new_query)

    # path fuzz: the reference replaces within URL.Path only
    # (fuzzing_rules.go:78-81) — splice the first occurrence AFTER the
    # scheme://host prefix so a selector matching the hostname is never
    # rewritten into a different host
    prefix = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)", 1)
    rest = F.substring(u, F.length(prefix) + 1, F.length(u))
    pos_in_rest = F.expr(
        "locate(selector, substring(url, length(regexp_extract(url,"
        " '^([A-Za-z][A-Za-z0-9+.\\\\-]*://[^/]*)', 1)) + 1, length(url)))"
    )
    path_fuzzed = F.concat(
        prefix,
        F.substring(rest, F.lit(1), pos_in_rest - 1),
        val,
        F.substring(rest, pos_in_rest + F.length(sel), F.length(rest)),
    )

    out = joined.withColumn(
        "fuzzed_url",
        F.when((F.col("param_name") == "query") & has_query, query_fuzzed).when(
            (F.col("param_name") == "path") & (pos_in_rest > 0), path_fuzzed
        ),
    ).filter(F.col("fuzzed_url").isNotNull())
    return out.select("url", "rule_name", "fuzz_value", "fuzzed_url")
