"""End-to-end corpus curation: the LLM-data tier composed as ONE DAG.

The registry proves each operator against a DuckDB oracle in isolation;
this pipeline is the composition proof — the standard pre-training
curation funnel (quality filter → language filter → exact dedup →
MinHash near-dedup → decontamination → partitioned lake write) built
from the same operators, with single-pass funnel accounting.

Generalizes the reference's linear extract→transform→load scripts
(mitodl/odl-etl email_mapping.py, mitx_etl.py main(): fixed stage
chains with side-effect logging) into a declarative multi-stage corpus
flow whose per-stage attrition is itself a DataFrame.

Scale posture:
  * Stages are ORDERED BY COST: codegen'd per-row filters first, the
    (shuffling) dedup stages only over their survivors.
  * Attrition accounting is ONE aggregation over a `reject_reason`
    column (first failing stage wins), not one count() job per stage —
    at 100 TB, six counts would be six full passes.
  * Near-dedup drops are decided by connected components over the
    MinHash-LSH pair graph (keep = component minimum), so duplicate
    CLUSTERS collapse to one representative even when pairs chain
    A~B~C without A~C.
  * The final write is the engine's dynamic-partition-overwrite sink —
    idempotent re-runs, partition pruning for readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odl_etl_spark.functions import text as T
from odl_etl_spark.io.sinks import partitioned_write
from odl_etl_spark.io.sources import load_table, spread
from odl_etl_spark.operators.components import connected_components
from odl_etl_spark.operators.dedup import minhash_lsh_pairs
from odl_etl_spark.operators.materialize import materialize

_STOPS = ("the", "a", "of", "and", "is", "in", "to")


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str | None,
    held_out_source: str = "src0",
    min_words: int = 20,
    near_threshold: float = 0.8,
    decontam_shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation funnel over ``documents``.

    Returns ``(kept, funnel)``: the curated corpus DataFrame (already
    written to ``out_path`` partitioned by source — pass ``None`` to
    skip the write, e.g. for the ``corpus_curation_funnel`` query key
    where only the attrition table is the result) and the attrition
    table ``(stage, n_docs)`` where stage is the FIRST gate each
    document failed ('kept' for survivors).
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    corpus = d.where(F.col("source") != held_out_source)

    # --- per-row gates (pure expressions, no shuffle) ------------------
    toks = T.tokens("text")
    n_words = F.size(toks)
    quality_ok = (
        (n_words >= min_words)
        & (T.mean_token_len("text") <= 12)
        & (T.stopword_ratio("text", _STOPS) >= 0.003)
    )
    lang_ok = T.predicted_lang("text") == F.lit("en")
    # Null-guard the gate flags: a null text makes both predicates NULL,
    # and ~NULL is NULL, so without the coalesce a null-text doc would
    # fall through every when() and be misattributed downstream. Null
    # text counts as a quality reject (ADVICE r5).
    base = corpus.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.coalesce(quality_ok, F.lit(False)).alias("_q"),
        F.coalesce(lang_ok, F.lit(False)).alias("_l"),
    )
    # base is read twice — the survivor pipeline below and the funnel
    # accounting join at the end; without a cut the second reader re-runs
    # the full scan + gate expressions (isolated profile, round 9:
    # ~1.3s/pass at sf0.1, the whole-corpus pass at 100 TB). One
    # corpus-sized materialization in exchange, the same trade
    # exact_kept already makes.
    base = materialize(base)
    survivors = base.where(F.col("_q") & F.col("_l")).select(
        "doc_id", "text", "lang", "source"
    )

    # --- exact dedup: keep the minimum doc_id per normalized text ------
    from pyspark.sql import Window

    wex = Window.partitionBy(F.xxhash64(F.trim(F.lower("text")))).orderBy("doc_id")
    # Materialize the RANKED relation (survivors + _rn), not just the
    # keepers: the funnel accounting below needs the exact-dup DROP ids
    # too, and deriving both sides from one materialization means the
    # window pipeline runs once and the drop set is a filter, not an
    # anti-join of two corpus-sized tables (r17: one shuffle join in the
    # accounting instead of three — guide §2.4).
    exact = materialize(survivors.withColumn("_rn", F.row_number().over(wex)))
    exact_kept = exact.where(F.col("_rn") == 1).drop("_rn")

    # --- near dedup: LSH pairs → components → keep component min -------
    pairs = minhash_lsh_pairs(
        exact_kept, "doc_id", "text", threshold=near_threshold
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    near_drops = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    # near_drops scales with corpus size (every near-duplicate id), so no
    # broadcast hint — at 100 TB it could blow the 8 GB broadcast limit.
    # AQE picks broadcast at small scale on its own (ADVICE r5).
    near_kept = exact_kept.join(near_drops, "doc_id", "anti")

    # --- decontamination: no 3-shingle overlap with the held-out set ---
    # Same posture as dedup_decontaminate: the benchmark shingle set is
    # DISTINCT-ed and broadcast; the corpus streams through a broadcast
    # semi-join — no corpus shuffle, no driver materialization. Shingles
    # travel as 64-bit xxhash64 values via the windowed token pipeline
    # (operators/dedup._shingle_hashes), not interpreted HOF string
    # shingles: 8 bytes/shingle in the broadcast instead of ~25-char
    # strings, and the codegen'd lead()-window beats the per-element
    # transform/slice/concat_ws path (r17 A/B at sf0.1: 0.9s vs 1.2s
    # for the contamination stage; same restructuring the dedup tier
    # made in round 13). Collision odds at 64 bits are ~|corpus|·|bench|
    # /2^64 — the jaccard_pairs postings precedent.
    from odl_etl_spark.operators.dedup import _shingle_hashes

    bench = (
        _shingle_hashes(
            d.where(F.col("source") == held_out_source),
            "doc_id",
            "text",
            decontam_shingle_n,
        )
        .select("_s64")
        .distinct()
    )
    contaminated_ids = (
        _shingle_hashes(near_kept, "doc_id", "text", decontam_shingle_n)
        .join(F.broadcast(bench), "_s64", "semi")
        .select(F.col("_id").alias("doc_id"))
        .distinct()
    )
    # contaminated_ids is also corpus-sized — same no-hint posture as
    # near_drops (the bench-shingle broadcast above is the bounded one).
    if out_path is not None:
        # With a lake write, `kept` is evaluated twice (the write below
        # and the funnel's kept_ids join) — cut the contamination
        # subtree (corpus-wide shingle explode + semi-join) so the
        # second evaluation reads the id list instead of re-mining it.
        # near_drops needs no cut: connected_components already returns
        # a materialized relation. The funnel-key path (out_path=None)
        # evaluates `kept` once, so the eager barrier would only add
        # latency there.
        contaminated_ids = materialize(contaminated_ids)
    kept = near_kept.join(contaminated_ids, "doc_id", "anti")

    # --- single-pass funnel accounting --------------------------------
    # One left join against the union of the three DROP sets (tagged
    # with the stage that dropped them) instead of three corpus×corpus
    # keep-set joins (r17 rewrite, guide §2.3/§2.4: the drop sets are
    # disjoint by construction — near drops are exact keepers,
    # contaminated ids are near keepers — and at every scale the drops
    # are the smaller side of the corpus split, so one exchange carries
    # strictly fewer bytes than any one of the three it replaces).
    # Warm A/B at sf0.1: funnel job 4.3s → 1.6s, identical table.
    drops = (
        exact.where(F.col("_rn") > 1)
        .select("doc_id", F.lit("exact_dup").alias("_stage"))
        .unionByName(near_drops.select("doc_id", F.lit("near_dup").alias("_stage")))
        .unionByName(
            contaminated_ids.select("doc_id", F.lit("contaminated").alias("_stage"))
        )
    )
    reason = (
        F.when(~F.col("_q"), "quality")
        .when(~F.col("_l"), "language")
        .when(F.col("_stage").isNotNull(), F.col("_stage"))
        .otherwise("kept")
    )
    funnel = (
        base.join(drops, "doc_id", "left")
        .groupBy(reason.alias("stage"))
        .agg(F.count("*").alias("n_docs"))
    )

    if out_path is not None:
        partitioned_write(kept, out_path, partition_cols=("source",))
    return kept, funnel
