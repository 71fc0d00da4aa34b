"""In-engine learning queries: classifier TRAINING + INFERENCE + EVAL
expressed as one declarative plan (no MLlib, no Python loop), so the
whole supervised pipeline -- split, fit, predict, confusion matrix --
is oracle-checkable like any other query.

Determinism contract: the train/test split is the md5 hash-gate
(repartition-stable, content-derived), all counts/priors are exact
integers, and every log term is quantized ONCE to the 1e-6 fixed-point
grid (floor-based half-up, identical IEEE ops in both engines) before
integer summation -- the q_temperature_mixture convention for non-
correctly-rounded libm functions.  Residual risk: a >=1-ulp ln()
divergence landing within 1e-15 of a grid boundary (~1e-9 per term),
accepted and documented like the pow case.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators.sampling import _MOD, duck_hash_gate, hash_gate
from ..functions.text import tokens
from ._util import cat, duck_tokens
from . import query

_NB_SALT = "nbsplit"
_NB_TRAIN = int(0.8 * _MOD)
_NB_P = 1_000_000.0  # log-term fixed-point grid


def _qln(col):
    """floor(ln(x) * 1e6 + 0.5) as BIGINT -- the quantized log term."""
    return F.floor(F.log(col) * F.lit(_NB_P) + F.lit(0.5)).cast("bigint")


_NB_GATE = duck_hash_gate("CAST(doc_id AS VARCHAR)", _NB_SALT)


@query(
    "q_nb_lang_classifier",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({duck_tokens('text')}) AS w FROM documents
),
train_docs AS (
  SELECT doc_id, lang FROM documents WHERE {_NB_GATE} < {_NB_TRAIN}
),
test_docs AS (
  SELECT doc_id, lang FROM documents WHERE {_NB_GATE} >= {_NB_TRAIN}
),
ttr AS (
  SELECT tr.lang, t.w FROM toks t JOIN train_docs tr USING (doc_id)
),
wc AS (SELECT lang, w, count(*) AS cnt FROM ttr GROUP BY lang, w),
nc AS (SELECT lang, count(*) AS n_tok FROM ttr GROUP BY lang),
v AS (SELECT count(DISTINCT w) AS nv FROM ttr),
cls AS (SELECT lang AS c, count(*) AS n_docs FROM train_docs GROUP BY lang),
tot AS (SELECT sum(n_docs) AS n FROM cls),
prior AS (
  SELECT c, CAST(floor(ln(CAST(n_docs AS DOUBLE)
    / (SELECT CAST(n AS DOUBLE) FROM tot)) * {_NB_P} + 0.5) AS BIGINT)
    AS prior_q
  FROM cls
),
ttok AS (
  SELECT t.doc_id, t.w, count(*) AS tf
  FROM toks t JOIN test_docs te USING (doc_id)
  GROUP BY t.doc_id, t.w
),
term AS (
  SELECT tt.doc_id, p.c,
    sum(tt.tf * CAST(floor(ln(
      CAST(COALESCE(wc.cnt, 0) + 1 AS DOUBLE)
      / CAST(nc.n_tok + v.nv AS DOUBLE)) * {_NB_P} + 0.5) AS BIGINT))
      AS tok_score
  FROM ttok tt
  CROSS JOIN (SELECT c FROM cls) p
  LEFT JOIN wc ON wc.lang = p.c AND wc.w = tt.w
  JOIN nc ON nc.lang = p.c
  CROSS JOIN v
  GROUP BY tt.doc_id, p.c
),
scores AS (
  SELECT td.doc_id, td.lang AS true_lang, pr.c,
    pr.prior_q + COALESCE(term.tok_score, 0) AS score
  FROM test_docs td
  CROSS JOIN prior pr
  LEFT JOIN term ON term.doc_id = td.doc_id AND term.c = pr.c
),
pred AS (
  SELECT doc_id, true_lang, c AS pred_lang FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, c) AS rn
    FROM scores
  ) WHERE rn = 1
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
""",
    tags=("learn", "classifier", "nb", "text", "ring-c"),
    description=(
        "Multinomial Naive Bayes language classifier trained, applied "
        "and evaluated ENTIRELY in-engine as one declarative plan: "
        "80/20 md5 hash-gate split, add-1-smoothed token likelihoods "
        "and document priors from the train fold, argmax posterior "
        "(log terms quantized to fixed-point BIGINT, exact integer "
        "sums, ties to the smaller class) on the test fold, output = "
        "the confusion matrix.  The full supervised pipeline is a "
        "value-oracled query -- no MLlib, no driver loop."
    ),
)
def q_nb_lang_classifier(spark, sf_dir):
    """Shuffle shape: token stats shuffle on (lang, w) / w; scoring
    joins the test token counts to the per-class likelihood table on
    the word key (the likelihood table is vocabulary-sized -- at
    100 TB it is the natural broadcast side after a df-cutoff) and
    reduces per (doc, class).  The 5-row class/prior/vocab relations
    ride along as broadcast crossJoins."""
    docs = cat(spark, sf_dir).documents
    gate = hash_gate(F.col("doc_id").cast("string"), _NB_SALT)
    base = docs.select("doc_id", "lang", tokens(F.lower("text")).alias("tk"))
    train = base.filter(gate < _NB_TRAIN)
    test = base.filter(gate >= _NB_TRAIN)

    ttr = train.select("lang", F.explode("tk").alias("w"))
    wc = ttr.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("cnt"))
    nc = ttr.groupBy("lang").agg(F.count(F.lit(1)).alias("n_tok"))
    v = ttr.agg(F.count_distinct("w").alias("nv"))
    cls = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = cls.agg(F.sum("n_docs").cast("double").alias("n"))
    prior = (
        cls.crossJoin(F.broadcast(tot))
        .select(
            F.col("lang").alias("c"),
            _qln(F.col("n_docs").cast("double") / F.col("n")).alias("prior_q"),
        )
    )

    ttok = (
        test.select("doc_id", F.explode("tk").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    classes = cls.select(F.col("lang").alias("c"))
    likelihood = (
        ttok.crossJoin(F.broadcast(classes))
        .join(
            wc.select(F.col("lang").alias("c"), "w", "cnt"), ["c", "w"], "left"
        )
        .join(F.broadcast(nc.select(F.col("lang").alias("c"), "n_tok")), "c")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "c",
            (
                F.col("tf")
                * _qln(
                    (F.coalesce("cnt", F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("n_tok") + F.col("nv")).cast("double")
                )
            ).alias("t"),
        )
    )
    term = likelihood.groupBy("doc_id", "c").agg(F.sum("t").alias("tok_score"))
    scores = (
        test.select("doc_id", F.col("lang").alias("true_lang"))
        .crossJoin(F.broadcast(prior))
        .join(term, ["doc_id", "c"], "left")
        .select(
            "doc_id",
            "true_lang",
            "c",
            (F.col("prior_q") + F.coalesce("tok_score", F.lit(0))).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "c")
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("c").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )
