"""PII scan / redaction queries (Ring C, training-data hygiene).

The fixture tables are synthetic and carry no real PII, so each query
first CONSTRUCTS a deterministic contact blob from customer fields --
identically on the Spark and DuckDB sides -- and then exercises the
real operators under test (functions/pii.py regex scan + redaction) on
that blob.  The scan itself is a narrow scan-project stage: no shuffle,
full codegen, safe to run over 100 TB of raw text as written.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import pii as P
from ._util import cat
from . import query

_DUCK_BLOB = (
    "c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@' || "
    "lower(c_mktsegment) || '.example.com> tel:+1-' || "
    "CAST(c_custkey % 900 + 100 AS VARCHAR) || '-' || "
    "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || "
    "' ip=10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' || "
    "CAST(c_nationkey AS VARCHAR) || '.' || CAST(c_custkey % 100 AS VARCHAR)"
)


def _spark_blob():
    key = F.col("c_custkey")
    return F.concat(
        F.col("c_name"),
        F.lit(" <user"),
        key.cast("string"),
        F.lit("@"),
        F.lower(F.col("c_mktsegment")),
        F.lit(".example.com> tel:+1-"),
        (key % 900 + 100).cast("string"),
        F.lit("-"),
        F.lpad((key % 10000).cast("string"), 4, "0"),
        F.lit(" ip=10."),
        (key % 256).cast("string"),
        F.lit("."),
        F.col("c_nationkey").cast("string"),
        F.lit("."),
        (key % 100).cast("string"),
    )


@query(
    "q_pii_scan_contacts",
    oracle=f"""
WITH c AS (
  SELECT c_custkey, {_DUCK_BLOB} AS contact
  FROM customer
)
SELECT c_custkey,
  CAST(len({P.duck_find_emails('contact')}) AS INTEGER) AS n_emails,
  {P.duck_email_domain('contact')} AS email_domain,
  {P.duck_has_phone('contact')} AS phone_found,
  {P.duck_has_ipv4('contact')} AS ip_found,
  {P.duck_redact_pii('contact')} AS redacted
FROM c
""",
    tags=("pii", "text", "ring-c"),
    description=(
        "Per-contact PII scan: email count/domain, phone + IPv4 detection, "
        "typed-placeholder redaction (functions/pii.py)."
    ),
)
def q_pii_scan_contacts(spark, sf_dir):
    cust = cat(spark, sf_dir).customer
    contact = _spark_blob()
    return cust.select(
        "c_custkey",
        F.size(P.find_emails(contact)).alias("n_emails"),
        P.email_domain(contact).alias("email_domain"),
        P.has_phone(contact).alias("phone_found"),
        P.has_ipv4(contact).alias("ip_found"),
        P.redact_pii(contact).alias("redacted"),
    )


@query(
    "q_pii_redaction_summary",
    oracle=f"""
WITH c AS (
  SELECT c_mktsegment, {_DUCK_BLOB} AS contact
  FROM customer
),
s AS (
  SELECT c_mktsegment,
    {P.duck_email_domain('contact')} AS dom,
    {P.duck_has_phone('contact')} AS p,
    {P.duck_has_ipv4('contact')} AS ip,
    {P.duck_redact_pii('contact')} AS red
  FROM c
)
SELECT c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_contacts,
  CAST(count(DISTINCT dom) AS BIGINT) AS n_domains,
  CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n_phones,
  CAST(sum(CASE WHEN ip THEN 1 ELSE 0 END) AS BIGINT) AS n_ips,
  CAST(sum(CASE WHEN red NOT LIKE '%@%' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clean_after_redact
FROM s
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("pii", "agg", "ring-c"),
    description=(
        "Per-segment redaction audit: contacts, distinct email domains, "
        "phone/IP hits, and rows fully cleaned by redaction."
    ),
)
def q_pii_redaction_summary(spark, sf_dir):
    cust = cat(spark, sf_dir).customer
    contact = _spark_blob()
    scanned = cust.select(
        "c_mktsegment",
        P.email_domain(contact).alias("dom"),
        P.has_phone(contact).cast("int").alias("p"),
        P.has_ipv4(contact).cast("int").alias("ip"),
        P.redact_pii(contact).alias("red"),
    )
    return (
        scanned.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_contacts"),
            F.count_distinct("dom").alias("n_domains"),
            F.sum("p").alias("n_phones"),
            F.sum("ip").alias("n_ips"),
            F.sum((~F.col("red").contains("@")).cast("bigint")).alias(
                "n_clean_after_redact"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_k_anonymity_audit",
    oracle="""
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
    count(*) AS group_size
  FROM customer
  GROUP BY c_nationkey, c_mktsegment, acctbal_band
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
    CAST(min(group_size) AS BIGINT) AS k_anonymity,
    CAST(sum(CASE WHEN group_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_groups_below_5,
    CAST(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END) AS BIGINT)
      AS n_rows_below_5,
    CAST(sum(group_size) AS BIGINT) AS n_rows
  FROM g
)
SELECT n_groups, k_anonymity, n_groups_below_5, n_rows_below_5,
  floor(CAST(n_rows_below_5 AS DOUBLE) / n_rows * 1000000.0 + 0.5)
    / 1000000.0 AS frac_rows_at_risk
FROM s
""",
    tags=("pii", "privacy", "compliance", "k-anonymity"),
    description=(
        "k-anonymity audit over the quasi-identifier combination "
        "(nation, market segment, account-balance band of 1000): the "
        "dataset's k (smallest equivalence class), how many classes "
        "and rows fall below k=5, and the at-risk row fraction -- the "
        "re-identification risk report a privacy review runs before "
        "release, complementing the PII content scans."
    ),
)
def q_k_anonymity_audit(spark, sf_dir):
    """One shuffle on the quasi-identifier key, then a 1-row reduce --
    the audit costs the same as a grouped count at any scale."""
    c = cat(spark, sf_dir).customer
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("bigint")
        .alias("acctbal_band"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    below = F.col("group_size") < 5
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("group_size").cast("bigint").alias("k_anonymity"),
        F.sum(below.cast("int")).cast("bigint").alias("n_groups_below_5"),
        F.sum(F.when(below, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_below_5"),
        (
            F.floor(
                F.sum(F.when(below, F.col("group_size")).otherwise(0))
                .cast("double")
                / F.sum("group_size")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("frac_rows_at_risk"),
    )


@query(
    "q_l_diversity_audit",
    oracle="""
WITH g AS (
  SELECT c_nationkey,
    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
    CAST(count(*) AS BIGINT) AS group_size,
    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct
  FROM customer
  GROUP BY c_nationkey, acctbal_band
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
  CAST(min(l_distinct) AS BIGINT) AS l_diversity,
  CAST(sum(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_groups_below_3,
  CAST(sum(CASE WHEN l_distinct < 3 THEN group_size ELSE 0 END) AS BIGINT)
    AS n_rows_below_3,
  floor(CAST(sum(CASE WHEN l_distinct < 3 THEN group_size ELSE 0 END)
             AS DOUBLE) / sum(group_size) * 1000000.0 + 0.5)
    / 1000000.0 AS frac_rows_at_risk
FROM g
""",
    tags=("pii", "privacy", "compliance", "l-diversity"),
    description=(
        "l-diversity audit over the (nation, account-balance band) "
        "quasi-identifier groups with market segment as the sensitive "
        "attribute: the dataset's l (fewest distinct sensitive values "
        "in any group), groups and rows below l=3, and the at-risk row "
        "fraction.  k-anonymity's sibling check -- a group can be "
        "large (k-safe) yet expose its members' segment because every "
        "row shares one sensitive value; this catches exactly that."
    ),
)
def q_l_diversity_audit(spark, sf_dir):
    """Same cost envelope as the k-anonymity audit: one shuffle on the
    QI key (count_distinct over the sensitive column is a partial-agg
    set union per group, bounded by |segments|=5), then a 1-row
    reduce."""
    c = cat(spark, sf_dir).customer
    g = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("bigint")
        .alias("acctbal_band"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
        F.count_distinct("c_mktsegment").cast("bigint").alias("l_distinct"),
    )
    below = F.col("l_distinct") < 3
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("l_distinct").cast("bigint").alias("l_diversity"),
        F.sum(below.cast("int")).cast("bigint").alias("n_groups_below_3"),
        F.sum(F.when(below, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_below_3"),
        (
            F.floor(
                F.sum(F.when(below, F.col("group_size")).otherwise(0))
                .cast("double")
                / F.sum("group_size")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("frac_rows_at_risk"),
    )


@query(
    "q_subject_access_report",
    oracle="""
WITH subj AS (
  -- a deletion/access BATCH is bounded by construction: the hash
  -- cohort is capped at 500 subjects (deterministic order), so every
  -- broadcast below is genuinely small at any data volume.
  SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 11
  ORDER BY c_custkey LIMIT 500
),
o AS (
  SELECT o_orderkey, o_custkey FROM orders JOIN subj ON o_custkey = k
)
SELECT 'customer' AS table_name,
  CAST(count(*) AS BIGINT) AS n_subjects,
  CAST(count(*) AS BIGINT) AS n_rows
FROM subj
UNION ALL
SELECT 'events',
  CAST(count(DISTINCT user_id) AS BIGINT),
  CAST(count(*) AS BIGINT)
FROM events JOIN subj ON user_id = k
UNION ALL
SELECT 'lineitem',
  CAST(count(DISTINCT o.o_custkey) AS BIGINT),
  CAST(count(*) AS BIGINT)
FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders',
  CAST(count(DISTINCT o_custkey) AS BIGINT),
  CAST(count(*) AS BIGINT)
FROM o
ORDER BY table_name
""",
    tags=("pii", "privacy", "compliance", "gdpr"),
    description=(
        "Subject-access / right-to-be-forgotten impact report: for a "
        "deterministic data-subject cohort (custkey % 97 = 11), the "
        "row footprint across every table that stores them -- direct "
        "rows (customer), keyed facts (orders, events) and "
        "second-hop facts reachable only through a join (lineitem "
        "via the subjects' orders).  The per-table scope estimate a "
        "DSAR or deletion run needs BEFORE touching data, rounding "
        "out the privacy ring (PII scan/redaction, k-anonymity, "
        "l-diversity)."
    ),
)
def q_subject_access_report(spark, sf_dir):
    """The subject cohort is CAPPED at 500 rows (a deletion batch,
    not a segment), so it broadcasts safely at any volume; the
    subjects' ORDERS relation scales with their activity, so that
    join is left to AQE rather than force-broadcast.  Every leg is a
    semi/inner join + map-side-combined count; the lineitem leg
    routes through the subjects' orders, the transitive-reach scan a
    real erasure run must do."""
    c = cat(spark, sf_dir)
    subj = (
        c.customer.filter(F.col("c_custkey") % 97 == 11)
        .select(F.col("c_custkey").alias("k"))
        .orderBy("k")
        .limit(500)
    )
    o = c.orders.join(
        F.broadcast(subj), F.col("o_custkey") == F.col("k")
    ).select("o_orderkey", "o_custkey")

    def leg(df, table, subj_col):
        return df.agg(
            F.count_distinct(subj_col).cast("bigint").alias("n_subjects"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        ).select(F.lit(table).alias("table_name"), "n_subjects", "n_rows")

    cust = subj.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
        F.lit("customer").alias("table_name"),
        F.col("n").alias("n_subjects"),
        F.col("n").alias("n_rows"),
    )
    ev = leg(
        c.events.join(F.broadcast(subj), F.col("user_id") == F.col("k")),
        "events",
        "user_id",
    )
    li = leg(
        c.lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey")),
        "lineitem",
        "o_custkey",
    )
    orders = leg(o, "orders", "o_custkey")
    return cust.unionAll(ev).unionAll(li).unionAll(orders).orderBy("table_name")
