"""Corpus-quality specs: statistical LM filtering and duplicate-span
coverage over the documents table.

Derivation: the reference lands raw text corpora into the lake
(mitodl/odl-etl mitx_etl.py's course exports); the 100 TB training-data
generalization is the quality-filtering tier every LLM pipeline runs
before tokenization — perplexity-style statistical filters (CCNet) and
cross-document duplicate-span coverage (RefinedWeb/FineWeb). Both are
pure expression + join/agg work: no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odl_etl_spark.functions import text as T
from odl_etl_spark.functions.numeric import roundn
from odl_etl_spark.io.sources import load_table, spread
from odl_etl_spark.queries.base import spec

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

_SPAN = 8  # tokens per duplicate-detection span


@spec(
    "text_unigram_ppl",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents
    ), tf AS (
      SELECT term, COUNT(*) AS tf FROM toks GROUP BY term
    ), tot AS (
      SELECT SUM(tf) AS total FROM tf
    )
    SELECT t.doc_id, COUNT(*) AS n_toks,
           ROUND(AVG(-LN(f.tf / tot.total)) * 10000) / 10000 AS xent
    FROM toks t JOIN tf f USING (term) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    doc=(
        "Unigram-LM cross-entropy per document (the CCNet/Wikipedia-LM "
        "perplexity filter, degree 1): train the unigram model on the "
        "corpus itself in one token-keyed agg, then score every "
        "document's mean -ln p(term). Plan shape: the token stream "
        "shuffles once on term to meet the model (postings-style join "
        "— the model is vocabulary-sized, never broadcast blindly), "
        "then once on doc_id for the per-doc mean; both aggs "
        "map-side-combine. At 100 TB the vocabulary relation is the "
        "small-but-not-tiny side AQE can still choose to broadcast; "
        "nothing materializes quadratic state. High-xent docs are the "
        "gibberish tail a quality gate drops."
    ),
)
def text_unigram_ppl(spark, sf_dir):
    from odl_etl_spark.operators.materialize import materialize

    d = load_table(spark, sf_dir, "documents")
    toks = spread(d).select("doc_id", F.explode(T.tokens("text")).alias("term"))
    # The vocabulary model is read twice (total-mass scalar + scoring
    # join) and each reference otherwise re-runs the corpus tokenize +
    # term agg; materialize the vocabulary-sized table once (r17). The
    # scoring pass over `toks` stays lazy — the token stream itself is
    # corpus-scale and is consumed exactly once.
    tf = materialize(toks.groupBy("term").agg(F.count("*").alias("tf")))
    total = tf.agg(F.sum("tf")).collect()[0][0]  # one scalar — parameter data
    return (
        toks.join(tf, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            roundn(
                F.avg(-F.log(F.col("tf") / F.lit(float(total)))), 4
            ).alias("xent"),
        )
    )


@spec(
    "dedup_span_coverage",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), pos AS (
      SELECT doc_id, toks,
             CAST(UNNEST(range(1, len(toks) - {_SPAN} + 2)) AS INTEGER) AS p
      FROM t WHERE len(toks) >= {_SPAN}
    ), sp AS (
      SELECT doc_id, p,
             md5(array_to_string(list_slice(toks, p, p + {_SPAN} - 1), ' ')) AS sh
      FROM pos
    ), df AS (
      SELECT sh, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY sh
    )
    SELECT sp.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_spans,
           ROUND(SUM(CASE WHEN df.df > 1 THEN 1.0 ELSE 0.0 END) / COUNT(*)
                 * 10000) / 10000 AS dup_frac
    FROM sp JOIN df USING (sh)
    GROUP BY sp.doc_id
    """,
    doc=(
        "Cross-document duplicate-span coverage (the RefinedWeb/FineWeb "
        "exact-substring-dedup diagnostic): every overlapping "
        f"{_SPAN}-token span is hashed, spans are counted across "
        "documents (DISTINCT doc so intra-doc repetition doesn't fake "
        "cross-doc df), and each document reports the fraction of its "
        "span positions covered by a span some other document also "
        "contains. Plan: bounded generator fan-out (one row per token "
        "position), one span-keyed agg for df, one span-keyed join "
        "back, one doc-keyed agg — all map-side-combined; nothing "
        "quadratic. The 8-byte span hash (md5 prefix semantics shared "
        "with the oracle) is what moves, not text. Docs >~dup_frac 0.5 "
        "are the candidates exact-substring dedup would cut."
    ),
)
def dedup_span_coverage(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = spread(d).select("doc_id", T.tokens("text").alias("toks"))
    pos = t.where(F.size("toks") >= _SPAN).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.size("toks") - _SPAN + 1).cast("array<int>")
        ).alias("p"),
    )
    sp = pos.select(
        "doc_id",
        "p",
        F.md5(F.array_join(F.slice("toks", F.col("p"), _SPAN), " ")).alias("sh"),
    )
    df = sp.groupBy("sh").agg(F.countDistinct("doc_id").alias("df"))
    dup = F.when(F.col("df") > 1, F.lit(1)).otherwise(F.lit(0))
    return (
        sp.join(df, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(dup).cast("bigint").alias("dup_spans"),
            roundn(F.sum(dup.cast("double")) / F.count("*"), 4).alias("dup_frac"),
        )
    )


@spec(
    "dedup_span_rewrite",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), pos AS (
      SELECT doc_id, toks,
             CAST(UNNEST(range(1, len(toks) - {_SPAN} + 2)) AS INTEGER) AS p
      FROM t WHERE len(toks) >= {_SPAN}
    ), sp AS (
      SELECT doc_id, p,
             md5(array_to_string(list_slice(toks, p, p + {_SPAN} - 1), ' ')) AS sh
      FROM pos
    ), rem AS (
      SELECT doc_id, p FROM (
        SELECT doc_id, p,
               ROW_NUMBER() OVER (PARTITION BY sh
                                  ORDER BY doc_id ASC, p ASC) AS rn
        FROM sp) z WHERE rn > 1
    ), rp AS (
      SELECT DISTINCT doc_id, tp FROM (
        SELECT doc_id, CAST(UNNEST(range(p, p + {_SPAN})) AS INTEGER) AS tp
        FROM rem) q
    ), tok AS (
      SELECT doc_id, CAST(generate_subscripts(toks, 1) AS INTEGER) AS tp,
             UNNEST(toks) AS term
      FROM t
    ), ka AS (
      SELECT k.doc_id, COUNT(*) AS n_kept,
             STRING_AGG(k.term, ' ' ORDER BY k.tp) AS text_dedup
      FROM tok k LEFT JOIN rp ON k.doc_id = rp.doc_id AND k.tp = rp.tp
      WHERE rp.doc_id IS NULL
      GROUP BY k.doc_id
    )
    SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_toks,
           CAST(len(t.toks) - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(ka.text_dedup, '') AS text_dedup
    FROM t LEFT JOIN ka ON t.doc_id = ka.doc_id
    """,
    doc=(
        "Exact-substring span REMOVAL, the rewrite counterpart of "
        "`dedup_span_coverage` (C4 §3.1 'three-sentence span' dedup / "
        "Lee et al. 2021 exact-substring dedup, token-window form): "
        f"every {_SPAN}-token span is hashed; for each span value only "
        "the globally first occurrence (lowest doc_id, then position — "
        "intra-doc repeats count too) survives; tokens covered by any "
        "non-first duplicate span are deleted and each document's "
        "surviving tokens are re-joined in order. Plan shape: one "
        "generator fan-out per token position, ONE corpus shuffle on "
        "the 16-byte span hash for the first-occurrence window (tiny "
        "per-hash partitions, so the in-partition sort is bounded), a "
        "doc-keyed distinct of only the removed positions (duplicate "
        "spans are the minority in a healthy corpus), a doc-keyed "
        "anti-join, and a doc-keyed reassembly agg — all "
        "map-side-combined, nothing quadratic, only hashes and "
        "positions shuffle beyond the final per-doc rebuild. At 100 TB "
        "this is the canonical dedup rewrite step between filtering "
        "and tokenization."
    ),
)
def dedup_span_rewrite(spark, sf_dir):
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = spread(d).select("doc_id", T.tokens("text").alias("toks"))
    pos = t.where(F.size("toks") >= _SPAN).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.size("toks") - _SPAN + 1).cast("array<int>")
        ).alias("p"),
    )
    sp = pos.select(
        "doc_id",
        "p",
        F.md5(F.array_join(F.slice("toks", F.col("p"), _SPAN), " ")).alias("sh"),
    )
    w = Window.partitionBy("sh").orderBy(F.col("doc_id").asc(), F.col("p").asc())
    rem = (
        sp.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + _SPAN - 1).cast("array<int>")
            ).alias("tp"),
        )
        .distinct()
    )
    tok = t.select(
        "doc_id", F.posexplode("toks").alias("p0", "term")
    ).select("doc_id", (F.col("p0") + 1).cast("int").alias("tp"), "term")
    ka = (
        tok.join(rem, ["doc_id", "tp"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tp", "term"))),
                    lambda s: s["term"],
                ),
                " ",
            ).alias("text_dedup"),
        )
    )
    base = t.select("doc_id", F.size("toks").cast("bigint").alias("n_toks"))
    return base.join(ka, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        (F.col("n_toks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )


SPECS = [text_unigram_ppl, dedup_span_coverage, dedup_span_rewrite]
