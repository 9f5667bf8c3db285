"""Deduplication operators for document corpora.

Four tiers, cheapest first — the standard LLM-training-data stack:

  1. ``exact_dedup``        — sha256 of raw text; hash-groupBy.
  2. ``fingerprint_dedup``  — sha256 of the sorted token bag; catches
                              reordered/case-variant duplicates.
  3. ``jaccard_pairs``      — exact n-gram-shingle Jaccard via an
                              inverted-index self-join; the ground truth
                              for near-dup, O(sum of postings²) worst case.
  4. ``minhash_lsh_pairs``  — MinHash signatures + banded LSH: candidate
                              generation in O(N·bands), then exact-Jaccard
                              verification of candidates only. This is the
                              100 TB path.

Scale notes: (3)'s self-join key is the shingle — ubiquitous shingles
are hot keys; ``max_df`` drops shingles appearing in more than that many
docs (stop-shingle filtering, standard practice, cannot remove a pair
whose similarity rests on rare shingles). (4) uses seeded xxhash64 — fully
deterministic across runs/engines, unlike ``spark.ml``'s MinHashLSH whose
hash coefficients come from a random seed object.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from odl_etl_spark.functions.hashing import content_fingerprint
from odl_etl_spark.functions.text import word_shingles
from odl_etl_spark.io.sources import spread
from odl_etl_spark.operators.materialize import materialize


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts: (content_sha, n_docs, keep_id = min id)."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def fingerprint_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Same, keyed on the order-insensitive token-bag fingerprint."""
    return (
        df.select(F.col(id_col), content_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def _shingle_postings(
    df: DataFrame, id_col: str, text_col: str, n: int, max_df: int | None
) -> DataFrame:
    # Postings carry a 64-bit shingle hash, not the string: the self-join
    # shuffles 8-byte keys instead of ~25-char strings (collision odds at
    # 64 bits are ~n²/2^65 — irrelevant beside the 0.8 threshold).
    sh = (
        spread(df)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(word_shingles(text_col, n)).alias("_s"),
        )
        .select("_id", F.xxhash64("_s").alias("_s"))
    )
    if max_df is not None:
        # No broadcast hint: the stop-shingle list grows with the corpus
        # (every shingle with df > max_df), so let AQE pick broadcast vs
        # shuffle — the anti-join shares the _s key with the main self-join.
        hot = sh.groupBy("_s").count().where(F.col("count") > max_df).select("_s")
        sh = sh.join(hot, "_s", "left_anti")
    return sh


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    Shuffles on the shingle (postings join) then on the pair (agg) — both
    standard hash exchanges, AQE handles residual skew.
    """
    # Materialize the capped postings: they feed THREE consumers (the
    # per-doc size agg and both self-join sides), and the upstream
    # shingle pipeline (tokenize + per-doc window) is the dominant cost
    # — the sf10p probe measured the un-materialized key at ~3x one
    # shingle pass (138s vs a 40s postings build; SCALING.md round-13
    # 100x probe). Postings are max_df-capped, so the materialized set
    # is O(corpus) rows of two longs — small relative to the text.
    sh = materialize(_shingle_postings(df, id_col, text_col, n, max_df))
    cnt = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    # Postings are O(total shingles) — never a broadcast candidate; the
    # hint makes the intended hash exchange explicit (the planner's size
    # estimate broadcasts one side at small sf — see SCALING.md, LSH
    # self-join re-plan).
    a, b = sh.alias("a"), sh.alias("b").hint("shuffle_hash")
    inter = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    ca = cnt.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    cb = cnt.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    jac = F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(_id, _s64) 64-bit hashes of every word n-gram shingle.

    Token-level pipeline: explode tokens → hash each token once → window
    ``lead`` to combine n consecutive token hashes into a shingle hash.
    No array higher-order functions anywhere (transform/slice/concat_ws
    run interpreted per element — the hot-spot this replaces); the only
    cost is one window sort per doc partition. Emits the shingle
    *multiset*; min-aggregation downstream is duplicate-insensitive.
    """
    from pyspark.sql import Window

    from odl_etl_spark.functions.text import tokens

    toks = spread(df).select(
        F.col(id_col).alias("_id"), F.posexplode(tokens(text_col)).alias("_pos", "_t")
    )
    hashed = toks.select("_id", "_pos", F.xxhash64("_t").alias("_h"))
    w = Window.partitionBy("_id").orderBy("_pos")
    leads = [F.col("_h")] + [F.lead("_h", k).over(w) for k in range(1, n)]
    return hashed.select(
        "_id", F.xxhash64(*leads).alias("_s64"), leads[-1].alias("_last")
    ).where(F.col("_last").isNotNull()).select("_id", "_s64")


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003) —
    rolling-hash fingerprinting with a guarantee: any token run of
    length ≥ w+k-1 shared by two documents yields a shared fingerprint.

    Rolling k-gram hashes per document, then every window of ``w``
    consecutive hashes selects its minimum; the distinct minima are the
    document's fingerprint set. Hashes are md5-derived (first 15 hex
    nibbles → 60-bit positive BIGINT), so any engine computes identical
    fingerprints from the same text — the whole pipeline is
    differentially checkable. The only non-agg cost is one window sort
    per document partition (same posture as ``_shingle_hashes``);
    selection and dedup are expression-level. Docs shorter than w+k-1
    tokens contribute their single all-kgram window (position 0).

    Returns distinct ``(_id, _fp)`` rows.
    """
    from pyspark.sql import Window

    from odl_etl_spark.functions.text import tokens

    toks = spread(df).select(
        F.col(id_col).alias("_id"), F.posexplode(tokens(text_col)).alias("_pos", "_t")
    )
    wd = Window.partitionBy("_id").orderBy("_pos")
    grams = [F.col("_t")] + [F.lead("_t", j).over(wd) for j in range(1, k)]
    kg = (
        toks.select(
            "_id",
            "_pos",
            F.conv(F.substring(F.md5(F.concat_ws(" ", *grams)), 1, 15), 16, 10)
            .cast("long")
            .alias("_h"),
            grams[-1].alias("_lastg"),
        )
        .where(F.col("_lastg").isNotNull())
        .drop("_lastg")
    )
    wmin = Window.partitionBy("_id").orderBy("_pos").rowsBetween(0, w - 1)
    wcnt = Window.partitionBy("_id")
    return (
        kg.select(
            "_id",
            "_pos",
            F.min("_h").over(wmin).alias("_fp"),
            F.count("*").over(wcnt).alias("_m"),
        )
        .where((F.col("_pos") <= F.col("_m") - w) | (F.col("_pos") == 0))
        .select("_id", "_fp")
        .distinct()
    )


def _minhash_signatures(
    shingle_hashes: DataFrame, num_hashes: int, band_size: int
) -> DataFrame:
    """(_id, _band, _bh) LSH band hashes from (_id, _s64) shingle hashes.

    Hash family h_i(s) = xxhash64(i, s64) — num_hashes cheap fixed-width
    hashes per shingle, reduced by ``min`` aggregates with map-side
    partial combine (one signature row per doc leaves each partition).
    """
    # SQL-string expressions, one parser call per column, instead of
    # chained Column operators — the operator form's py4j round-trips
    # are measurable driver time per build, and streaming ingest
    # re-builds this pipeline once per micro-batch (r17; same change as
    # simhash_signatures). The bare `{i}` literal parses as INT exactly
    # like F.lit(i) did, so every xxhash64 input type — and therefore
    # every signature — is unchanged.
    sigs = shingle_hashes.groupBy("_id").agg(
        *[
            F.expr(f"min(xxhash64({i}, _s64))").alias(f"_mh{i}")
            for i in range(num_hashes)
        ]
    )
    bands = ", ".join(
        "xxhash64({})".format(
            ", ".join(f"_mh{i}" for i in range(b, b + band_size))
        )
        for b in range(0, num_hashes, band_size)
    )
    return sigs.select(
        "_id", F.posexplode(F.expr(f"array({bands})")).alias("_band", "_bh")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    band_size: int = 4,
) -> DataFrame:
    """MinHash + banded LSH candidates, verified with exact Jaccard.

    With r=band_size, b=num_hashes/r bands, a pair of true similarity j
    becomes a candidate with p = 1-(1-j^r)^b (at r=4, b=16: >0.9998 for
    j>=0.8). Only candidates pay the exact-verification cost, so total
    work is O(N·num_hashes) + O(|candidates|) — the property that makes
    near-dedup feasible at 100 TB where all-pairs (even inverted-index)
    is not.
    """
    # Only (id, band, hash) flows into the self-join — never shingle
    # strings or arrays (shuffling those is the thing that does not
    # survive scale). Shingle arrays are joined back per *distinct*
    # candidate pair, of which there are few by construction.
    banded = _minhash_signatures(
        _shingle_hashes(df, id_col, text_col, n), num_hashes, band_size
    )
    # Self-join strategy: force a shuffled hash join on (_band, _bh).
    # Left to stats, the planner broadcasts one side — but `banded` is
    # O(N·bands), so that broadcast grows with the corpus (a scale
    # hazard, not a dim table). Hash-partitioning both sides lets the
    # runtime reuse the one signature computation across them, and
    # measured 16% faster than the broadcast plan at sf0.1 (median-of-5;
    # sort-merge was between the two).
    a, b = banded.alias("a"), banded.alias("b").hint("shuffle_hash")
    candidates = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bh") == F.col("b._bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Materialize the (small-by-construction) candidate set: it is
    # referenced three times below (both branches of cand_ids and the
    # final verify join), and each reference would otherwise re-run
    # the banded self-join from scratch. ~30% off the end-to-end at
    # sf0.1; at cluster scale this is a tiny table (cut mode switchable,
    # operators/materialize.py).
    candidates = materialize(candidates)
    # Verification shingles are computed only for docs that appear in a
    # candidate pair (semi-join first) — never re-shingle the full corpus.
    cand_ids = (
        candidates.select(F.col("id_a").alias("_id"))
        .unionByName(candidates.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    needed = df.join(
        F.broadcast(cand_ids), F.col(id_col) == F.col("_id"), "left_semi"
    ).select(F.col(id_col).alias("_nid"), word_shingles(text_col, n).alias("_nsh"))
    sh_a = needed.select(F.col("_nid").alias("id_a"), F.col("_nsh").alias("_sha"))
    sh_b = needed.select(F.col("_nid").alias("id_b"), F.col("_nsh").alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size(F.array_union("_sha", "_shb"))
    return (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    band_size: int = 4,
) -> DataFrame:
    """Build the persistable ``(_id, _band, _bh)`` LSH band index for a
    corpus — the relation a production deployment stores (parquet,
    partitioned by ``_band``) and GROWS as batches commit, instead of
    re-banding raw text per probe. ``minhash_lsh_probe`` accepts it via
    ``existing_index=`` / ``new_index=``; `dedup_stream_ingest` is the
    composed ingest loop that commits one per micro-batch.

    The build params (n, num_hashes, band_size) are stamped as
    StructField metadata on ``_bh`` — metadata survives a parquet
    write/read, so a probe against a stored index built with different
    params fails loudly instead of silently dropping candidates."""
    out = _minhash_signatures(
        _shingle_hashes(df, id_col, text_col, n), num_hashes, band_size
    )
    meta = {"n": n, "num_hashes": num_hashes, "band_size": band_size}
    return out.withColumn("_bh", F.col("_bh").alias("_bh", metadata=meta))


def _index_params(index: DataFrame) -> dict | None:
    """The (n, num_hashes, band_size) stamp from a band index's ``_bh``
    field metadata, or None for an index predating the stamp."""
    for f in index.schema.fields:
        if f.name == "_bh" and f.metadata and "num_hashes" in f.metadata:
            return {k: int(f.metadata[k]) for k in ("n", "num_hashes", "band_size")}
    return None


def minhash_lsh_probe(
    new: DataFrame,
    existing: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    band_size: int = 4,
    new_index: DataFrame | None = None,
    existing_index: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dedup: probe a NEW batch against an EXISTING
    corpus — the daily-ingest posture (generalizes the reference's daily
    batch cadence, mitx_etl.py:16-17, to the LLM dedup tier).

    Same MinHash family and banding as ``minhash_lsh_pairs`` (so the
    existing side's (_id, _band, _bh) index is persistable and reusable
    across days: build once, probe every batch), but the candidate join
    is NEW x EXISTING instead of a self-join — candidate volume scales
    with the batch, not the corpus, and only the batch's band tuples
    shuffle against the index. Pass ``existing_index`` (and optionally
    ``new_index``) from ``minhash_band_index`` to probe against a
    PREBUILT index instead of re-banding ``existing``'s raw text — the
    stored-index path an ingest loop uses; when given, they must have
    been built with the same (n, num_hashes, band_size) — indexes
    carrying the ``minhash_band_index`` metadata stamp are verified and
    a mismatch raises ``ValueError``. Returns
    (new_id, ex_id, jaccard >= threshold) pairs; dropping ``new_id``s
    anti-joins the batch.

    Silent-drop semantics of the verify joins: the final exact-Jaccard
    stage inner-joins candidates back to the RAW ``new``/``existing``
    frames to fetch shingles. A candidate whose doc id is absent from
    the raw frame (an index row with no backing document, e.g. an index
    committed ahead of its docs store) is dropped without error — the
    raw frames are the source of truth, the index is an accelerator.
    Keep index and docs commits paired (as ``streaming/ingest_dedup``
    does: docs first, index last) so this path never loses pairs.
    """
    expected = {"n": n, "num_hashes": num_hashes, "band_size": band_size}
    for label, idx in (("new_index", new_index), ("existing_index", existing_index)):
        if idx is None:
            continue
        got = _index_params(idx)
        if got is not None and got != expected:
            raise ValueError(
                f"{label} was built with {got} but probe called with "
                f"{expected}; rebuild the index or match the probe params"
            )
    banded_new = (
        new_index
        if new_index is not None
        else _minhash_signatures(
            _shingle_hashes(new, id_col, text_col, n), num_hashes, band_size
        )
    )
    banded_ex = (
        existing_index
        if existing_index is not None
        else _minhash_signatures(
            _shingle_hashes(existing, id_col, text_col, n), num_hashes, band_size
        )
    )
    a, b = banded_new.alias("a"), banded_ex.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bh") == F.col("b._bh")),
        )
        .select(F.col("a._id").alias("new_id"), F.col("b._id").alias("ex_id"))
        .dropDuplicates(["new_id", "ex_id"])
    )
    candidates = materialize(candidates)  # read 3x below, same as pairs
    new_ids = candidates.select(F.col("new_id").alias("_id")).distinct()
    ex_ids = candidates.select(F.col("ex_id").alias("_id")).distinct()
    sh_new = new.join(
        F.broadcast(new_ids), F.col(id_col) == F.col("_id"), "left_semi"
    ).select(F.col(id_col).alias("new_id"), word_shingles(text_col, n).alias("_sha"))
    sh_ex = existing.join(
        F.broadcast(ex_ids), F.col(id_col) == F.col("_id"), "left_semi"
    ).select(F.col(id_col).alias("ex_id"), word_shingles(text_col, n).alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size(F.array_union("_sha", "_shb"))
    return (
        candidates.join(sh_new, "new_id")
        .join(sh_ex, "ex_id")
        .select("new_id", "ex_id", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash64(text_col: Column | str, token_arr: Column | None = None) -> Column:
    """64-bit SimHash of the token multiset, as a pure expression.

    Per token: 64-bit xxhash64; each signature bit is the sign of the
    per-bit vote sum (+1 if set, -1 if clear) over tokens. Near-identical
    docs differ in a few bits; hamming distance = bit_count(a XOR b).
    """
    from odl_etl_spark.functions.text import tokens

    toks = token_arr if token_arr is not None else tokens(text_col)
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.when(F.getbit(F.xxhash64(t), i) == 1, 1).otherwise(-1).cast("long"),
            ),
            lambda a, v: a + v,
        ),
    )
    # Assemble the signature driver-side bit by bit (shift amounts must be
    # Python ints); bit 63 is the sign bit of the signed long.
    sig = F.lit(0).cast("long")
    for i in range(64):
        weight = (1 << i) if i < 63 else -(1 << 63)
        sig = sig + F.when(
            F.element_at(votes, i + 1) > 0, F.lit(weight).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, token_hash: str = "xxhash64"
) -> DataFrame:
    """(_id, _sig) SimHash-64 signatures via explode + 64 vote aggregates.

    Semantically identical to ``simhash64`` (same per-token hash, same
    bit votes) but expressed as codegen'd SUM aggregates with map-side
    partial combine instead of interpreted higher-order array functions
    — the same restructuring that makes MinHash signatures scale.

    ``token_hash``:
      * ``"xxhash64"`` (default) — fastest; Spark-specific hash.
      * ``"md5"`` — 64-bit hash = first 16 hex nibbles of md5(token);
        bit b (b=0 is the MSB of nibble 0) = (nibble[b//4] >> (3-b%4)) & 1.
        Every piece (md5, substring, hex-digit value) is computable
        identically in other engines (DuckDB: strpos on a hex alphabet),
        which makes the signatures — and therefore the near-dup pair set
        — differentially verifiable cross-engine.
    """
    from odl_etl_spark.functions.text import tokens

    toks = spread(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_t")
    )
    # The 64 vote aggregates and the 64-term signature assembly are
    # built as SQL-string expressions (one parser call each) instead of
    # chained Column operators: the operator form cost ~11k py4j
    # round-trips ≈ 1.9 s of driver time PER BUILD (r17 cProfile), pure
    # construction overhead repeated every bench rep. The parsed trees
    # are the same Catalyst expressions (shiftright/&/CASE WHEN), so
    # the analyzed plan — and the signatures — are unchanged.
    if token_hash == "xxhash64":
        hashed = toks.select("_id", F.xxhash64("_t").alias("_h"))

        def bit(b: int) -> str:
            return f"getbit(_h, {b})"

    elif token_hash == "md5":
        # Materialize the 16 nibble values once; each of the 64 bit
        # expressions is then a shift+mask on an int column (codegen'd).
        hashed = toks.select("_id", F.md5("_t").alias("_m")).select(
            "_id",
            *[
                F.expr(
                    f"cast(conv(substring(_m, {j + 1}, 1), 16, 10) as int)"
                ).alias(f"_nb{j}")
                for j in range(16)
            ],
        )

        def bit(b: int) -> str:
            return f"(shiftright(_nb{b // 4}, {3 - b % 4}) & 1)"

    else:
        raise ValueError(f"unknown token_hash: {token_hash!r}")
    votes = hashed.groupBy("_id").agg(
        *[F.expr(f"sum(2 * {bit(i)} - 1)").alias(f"_v{i}") for i in range(64)]
    )
    sig_terms = ["cast(0 as bigint)"]
    for i in range(64):
        weight = (1 << i) if i < 63 else -(1 << 63)
        sig_terms.append(
            f"case when _v{i} > 0 then cast({weight} as bigint) "
            "else cast(0 as bigint) end"
        )
    return votes.select("_id", F.expr(" + ".join(sig_terms)).alias("_sig"))


def simhash_block_keys(sig_col, max_hamming: int) -> list:
    """Blocking keys for one simhash signature column.

    max_hamming <= 3: Manku-style combination blocking — 64 bits split
    into 6 blocks (4x11 + 2x10), one packed key per C(6,3)=20 3-block
    combination (pigeonhole: <= 3 bit errors leave >= 3 blocks intact,
    so recall is EXACT). Otherwise the legacy 4x16-bit chunk scheme.
    The ARITY (20 vs 4 keys/doc) is the scale property — it is what
    drops the bucket-join collision term from n^2/2^16 to the joint
    three-block distribution — and is pinned structurally by
    tests/test_operators.py::test_simhash_blocking_width_is_the_scale_property
    (ADVICE r13 #4: via this helper's arity + shiftrightunsigned plan
    counts, not literal constant renderings)."""
    if max_hamming <= 3:
        from itertools import combinations

        # (offset, width) for 6 blocks covering all 64 bits.
        bounds = [(0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10)]
        blocks = [
            F.shiftrightunsigned(sig_col, off).bitwiseAND(F.lit((1 << width) - 1))
            for off, width in bounds
        ]
        return [
            blocks[i] * F.lit(1 << 22) + blocks[j] * F.lit(1 << 11) + blocks[k]
            for i, j, k in combinations(range(6), 3)
        ]
    return [
        F.shiftrightunsigned(sig_col, k * 16).bitwiseAND(F.lit(0xFFFF))
        for k in range(4)
    ]


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs with exact-recall blocking, verified with
    exact hamming distance.

    Blocking (max_hamming <= 3, the registry contract): Manku-style
    COMBINATION blocking — the 64 bits split into 6 blocks (4x11 + 2x10
    bits); <= 3 bit errors damage <= 3 blocks, so >= 3 blocks survive
    intact and the pair agrees exactly on at least one of the C(6,3)=20
    3-block combinations (pigeonhole — recall EXACT, same as the old
    4x16-bit chunk scheme). The win is the key width: agreement is now
    on ~32 packed bits instead of 16, so the random/skew collision term
    of bucket joins drops by the joint distribution of three blocks.
    Measured at the 100x probe corpus (500k docs): 46.2M candidate
    pairs under 16-bit chunks — growing x12.5 per data decade, the
    n^2/2^16 term — vs the combination scheme's near-linear candidate
    volume (SCALING.md round-13). Cost: 20 exploded rows/doc vs 4, two
    longs each — linear and tiny next to the quadratic it removes.

    For max_hamming in (4, 6] the old 4-chunk blocking is kept as the
    documented high-recall heuristic (6 blocks choose 3 only guarantees
    recall through hamming 3); beyond 6 the pigeonhole gives nothing.
    The signature table is materialized: it feeds both self-join sides,
    and the vote pipeline (tokenize + 64 partial-combined sums) is the
    expensive stage."""
    sig = materialize(
        simhash_signatures(df, id_col, text_col, token_hash=token_hash)
    )
    packed = simhash_block_keys(F.col("_sig"), max_hamming)
    chunks = sig.select(
        "_id",
        "_sig",
        F.posexplode(F.array(*packed)).alias("_chunk", "_ch"),
    )
    # Chunk rows are O(4N) — same shuffle-not-broadcast posture as the
    # minhash banded self-join (SCALING.md).
    a, b = chunks.alias("a"), chunks.alias("b").hint("shuffle_hash")
    ham = F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig")))
    return (
        a.join(
            b,
            (F.col("a._chunk") == F.col("b._chunk"))
            & (F.col("a._ch") == F.col("b._ch"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )
