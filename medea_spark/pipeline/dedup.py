"""Deduplication operators for training-data pipelines.

Four families, each with a clear scale story:

* exact           — one hash aggregation on md5(text); the 100 TB
                    workhorse.  md5 is bit-stable across engines, so
                    the DuckDB oracle reproduces it exactly.
* n-gram Jaccard  — shingle explode + self-join on shingle; candidate
                    pairs only ever meet if they share a shingle, so
                    the join is bucketed by construction.  Quadratic
                    only within a shingle's posting list (cap it).
* MinHash + LSH   — k min-hashes from md5-derived 64-bit hashes, banded
                    into LSH keys; near-dup candidates = docs sharing a
                    band key.  Everything is expressible with built-in
                    functions (no UDF), and because the hash is md5 the
                    signatures are engine-portable.
* SimHash         — 60-bit majority-vote fingerprint over md5-portable
                    token hashes, computed with built-in columnar ops
                    (explode + 60 sum aggregates, map-side combined);
                    near-dups = identical simhash (or small Hamming
                    distance via multi-probe bands).

Embedding-cosine near-dup lives in medea_spark.pipeline.similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm_words(text_col: Column) -> Column:
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_hash, n_docs, keep_id): groups of byte-identical documents
    (after lowercase+whitespace normalization); keep_id is the smallest
    member — the canonical survivor of a dedup pass."""
    h = F.md5(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "))
    return (
        df.select(F.col(id_col).alias("doc_id"), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, unit: str = "word"
) -> DataFrame:
    """Distinct n-gram shingles per document: (doc_id, shingle).

    ``unit="word"`` (default) shingles over whitespace tokens;
    ``unit="char"`` shingles over characters of the normalized text —
    the classic choice for source code and short strings, where token
    boundaries are unreliable.  Documents shorter than n units produce
    no shingles.

    The normalized form is STAGED as a named column before the
    ``transform`` lambda: HOF lambdas run interpreted, and an outer
    expression captured in the lambda re-evaluates once per array
    element (the CLAUDE.md lang_scores class) — unstaged, every n-gram
    of a d-char document re-ran the regexp normalization, turning an
    O(d) explode into O(d²) regex work per document (measured ~5×
    on jaccard_char_pairs).  The stage survives CollapseProject because
    the normalized column is non-cheap and multi-referenced
    (SPARK-36718)."""
    if unit == "char":
        norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
        base = df.select(F.col(id_col).alias("doc_id"), norm.alias("_u"))
        n_grams = F.length(F.col("_u")) - (n - 1)
        gram = lambda i: F.col("_u").substr(i, F.lit(n))  # noqa: E731
    elif unit == "word":
        base = df.select(
            F.col(id_col).alias("doc_id"), _norm_words(F.col(text_col)).alias("_u")
        )
        n_grams = F.size(F.col("_u")) - (n - 1)
        gram = lambda i: F.concat_ws(" ", F.slice(F.col("_u"), i, n))  # noqa: E731
    else:
        raise ValueError(f"unknown shingle unit {unit!r}")
    # Guard: Spark's sequence(1, 0) counts *down* — short docs need an
    # explicit empty array (DuckDB's generate_series(1, 0) is empty).
    grams = F.when(
        n_grams >= 1,
        F.transform(F.sequence(F.lit(1), n_grams), gram),
    ).otherwise(F.array().cast("array<string>"))
    return base.select("doc_id", F.explode(grams).alias("shingle")).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int = 1000,
    unit: str = "word",
    stage_location: str | None = None,
) -> DataFrame:
    """Document pairs (a < b) with shingle-set Jaccard ≥ threshold.

    Scale guard: shingles appearing in more than ``max_posting`` docs
    are dropped before the self-join (stopword-like shingles explode
    quadratically and carry no dedup signal — standard posting-list
    capping).

    The post-cap shingle relation feeds three plan branches (doc sizes
    + both self-join sides).  ``stage_location`` (the 100 TB path)
    materializes it to parquet once and every branch becomes a plain
    scan — the downstream plan collapses to scan → join → agg, with no
    session-lifetime cache pinning memory/disk.  Without it the
    relation is session-persisted instead (fine for exploration; the
    cache of the full shingle explode is the thing that turns into a
    memory/disk cliff at 100×).
    """
    stats = _shingle_pair_stats(
        df, id_col, text_col, n, max_posting, unit, stage_location
    )
    return (
        stats.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sh_a") + F.col("sh_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _shingle_pair_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_posting: int,
    unit: str,
    stage_location: str | None,
) -> DataFrame:
    """Shared pair machinery for set-overlap measures:
    (doc_a, doc_b, inter, sh_a, sh_b) for every co-shingled pair a < b,
    over the post-cap shingle universe (see ngram_jaccard_pairs for
    why the sizes must be post-cap too)."""
    raw = shingles(df, id_col, text_col, n, unit=unit)
    posting_ok = (
        raw.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") <= max_posting)
        .select("shingle")
    )
    sh = raw.join(posting_ok, "shingle")
    if stage_location is not None:
        sh.write.mode("overwrite").parquet(stage_location)
        sh = df.sparkSession.read.parquet(stage_location)
    else:
        sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return pairs.join(
        sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a"),
        "doc_a",
    ).join(
        sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b"),
        "doc_b",
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int = 1000,
    unit: str = "word",
    stage_location: str | None = None,
) -> DataFrame:
    """Document pairs (a < b) with shingle-set CONTAINMENT ≥ threshold:
    ``containment = |A∩B| / min(|A|, |B|)`` — the asymmetric measure
    that catches a short document quoted inside a long one, which
    Jaccard misses entirely (a 50-shingle quote in a 5000-shingle doc
    has Jaccard ≈ 0.01 but containment 1.0).  ``contained_doc`` names
    the smaller-set side (ties → doc_a, deterministic).  Same posting
    cap / staging contract as :func:`ngram_jaccard_pairs`."""
    stats = _shingle_pair_stats(
        df, id_col, text_col, n, max_posting, unit, stage_location
    )
    return (
        stats.withColumn(
            "containment",
            F.round(F.col("inter") / F.least("sh_a", "sh_b"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .withColumn(
            "contained_doc",
            F.when(F.col("sh_a") <= F.col("sh_b"), F.col("doc_a")).otherwise(
                F.col("doc_b")
            ),
        )
        .select("doc_a", "doc_b", "containment", "contained_doc")
    )


def _md5_hash64(col: Column) -> Column:
    """Portable unsigned-ish 60-bit integer from md5 — identical in
    Spark and DuckDB (conv(substr(md5(x),1,15),16,10))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 8
) -> DataFrame:
    """(doc_id, h0..h{k-1}) MinHash signatures from md5-seeded hash
    family h_i(s) = hash64(i || ' ' || s).  One explode + one groupBy;
    engine-portable (oracle SQL can reproduce bit-exactly)."""
    sh = shingles(df, id_col, text_col, n)
    aggs = [
        F.min(_md5_hash64(F.concat(F.lit(f"{i} "), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """The persistable LSH index relation: ``(doc_id, band, key)``, one
    row per document per band (band key = md5 of the band's
    concatenated min-hashes).

    This is the unit of INCREMENTAL dedup at 100 TB: compute it once
    per ingested batch, append it to a parquet/bucketed index table,
    and new batches join their (tiny) band relation against it —
    the historical corpus text is never re-read and never re-shingled.
    Saving via ``bucketBy(B, "band", "key")`` (BOTH join keys — Spark
    requires all cluster keys for co-partitioning, so bucketing on
    key alone still exchanges) kills the index-side exchange of that
    join whenever the index is too big to broadcast, which at scale
    it always is; bucket metadata survives only saveAsTable
    (plan-asserted in test_incremental_index_bucketing_drops_exchange).
    """
    assert k % bands == 0
    rows_per_band = k // bands
    sig = minhash_signatures(df, id_col, text_col, n, k)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("_", *parts)).alias("key"),
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band
    (band key = md5 of the band's concatenated min-hashes)."""
    banded = minhash_band_index(df, id_col, text_col, n, k, bands)
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )


def incremental_lsh_candidates(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    include_new_new: bool = True,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates for a NEW batch against a PERSISTED band
    index (``minhash_band_index`` output: doc_id, band, key), without
    touching historical text.

    Returns ``(new_doc, match_doc, kind)`` where kind is ``'new_old'``
    (matched an indexed document) or ``'new_new'`` (two documents of
    this batch match each other; emitted once with new_doc < match_doc).

    Scale shape: the only full-corpus artifact read is the band index —
    ~``bands`` small rows per historical doc, no text.  The new batch
    shingles/hashes locally (one explode + one groupBy over the BATCH),
    and both joins are band-key equi-joins.  With the index saved via
    ``bucketBy(B, "band", "key")`` — BOTH join keys, per
    minhash_band_index's docstring — the new-old join shuffles only
    the new side; either way nothing is quadratic beyond a shared
    band's posting list.  Index ids are assumed disjoint from batch
    ids (enforce upstream with an id namespace, as any append-only
    ingest does); IDENTITY pairs (a batch id also present in the
    index, e.g. an at-least-once replay joining its own appended
    bands) are excluded — a doc is never a duplicate of itself, so a
    replayed ingest only re-emits rows a read-side distinct removes.

    ``new_bands`` short-circuits the banding when the caller already
    computed (and persisted) ``minhash_band_index(new_docs, ...)`` —
    the ingest job bands the batch ONCE and reuses the relation for
    both joins and the index append.
    """
    if set(index.columns) != {"doc_id", "band", "key"}:
        raise ValueError(
            f"index must be a minhash_band_index relation "
            f"(doc_id, band, key); got {sorted(index.columns)}"
        )
    if new_bands is not None and set(new_bands.columns) != {"doc_id", "band", "key"}:
        raise ValueError(
            f"new_bands must be a minhash_band_index relation "
            f"(doc_id, band, key); got {sorted(new_bands.columns)}"
        )
    new_banded = (
        new_bands
        if new_bands is not None
        else minhash_band_index(new_docs, id_col, text_col, n, k, bands)
    )
    new_old = (
        new_banded.alias("x")
        .join(index.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") != F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("new_doc"),
            F.col("y.doc_id").alias("match_doc"),
            F.lit("new_old").alias("kind"),
        )
    )
    if not include_new_new:
        return new_old.distinct()
    new_new = (
        new_banded.alias("x")
        .join(new_banded.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("new_doc"),
            F.col("y.doc_id").alias("match_doc"),
            F.lit("new_new").alias("kind"),
        )
    )
    return new_old.unionByName(new_new).distinct()


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column | str,
    max_dist: int,
    max_block: int = 10_000,
) -> DataFrame:
    """Blocked fuzzy-duplicate pairs (record-linkage style): candidates
    meet ONLY inside a block — an equi-join on the caller's blocking
    expression (prefix, normalized key, phonetic code, ...) — and
    survive if ``levenshtein(text_a, text_b) <= max_dist``.  Returns
    ``(doc_a, doc_b, dist)`` with doc_a < doc_b.

    Scale shape: never all-pairs — quadratic only inside a block, and
    blocks larger than ``max_block`` rows are dropped entirely (the
    posting-cap pattern from ngram_jaccard_pairs: a degenerate block
    key, like an empty prefix, would otherwise go globally quadratic).
    The block-size count is a window over the same partitioning the
    self-join needs, so the relation exchanges once.  NULL blocks and
    NULL texts never match (dropped before the join).

    Edit distance is computed on the STRING as stored: Spark's
    levenshtein counts unicode characters while DuckDB's counts UTF-8
    bytes, so cross-engine-oracled uses must keep ``text_col`` ASCII
    (the operator itself is fine with any unicode).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if max_block < 2:
        raise ValueError(f"max_block must allow pairs (>= 2), got {max_block}")
    block_col = F.col(block) if isinstance(block, str) else block
    b = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("nm"),
            block_col.alias("blk"),
        )
        .filter(F.col("blk").isNotNull() & F.col("nm").isNotNull())
        .withColumn(
            "_blk_n", F.count(F.lit(1)).over(Window.partitionBy("blk"))
        )
        .filter(F.col("_blk_n") <= max_block)
        .drop("_blk_n")
    )
    # Bounded levenshtein (threshold arg): banded O(len·max_dist) DP
    # that early-exits with -1 above the threshold — Catalyst pushes
    # the dist filter through the projection, re-evaluating the
    # expression per reference (CLAUDE.md), so the per-evaluation cost
    # matters more than the reference count.
    return (
        b.alias("x")
        .join(b.alias("y"), "blk")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.levenshtein(
                F.col("x.nm"), F.col("y.nm"), threshold=max(1, max_dist)
            ).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )


SIMHASH_BITS = 60  # 15 hex chars of md5 — the engine-portable hash width


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    empty_sentinel: int | None = None,
) -> DataFrame:
    """60-bit SimHash per document, entirely with built-in columnar ops.

    token hash = the md5-portable 60-bit family (_md5_hash64); bit b of
    the fingerprint = majority vote of bit b over all token occurrences
    (ties → 0).  Shape: one explode + one map-side-combined groupBy with
    60 sum aggregates — the same scale profile as MinHash, no Python in
    the hot path, and bit-identical in any engine with md5 (the DuckDB
    oracle reproduces it).

    Empty/whitespace-only documents produce NO row by default (the
    classic formulation has no fingerprint for a token-less doc) — a
    row-count change versus naive expectations that downstream joins
    must account for.  Pass ``empty_sentinel`` to instead left-join
    back to the input and emit that fingerprint for token-less docs
    (they then group/pair with each other, which is usually what a
    dedup pass wants).
    """
    if empty_sentinel is not None and 0 <= empty_sentinel < (1 << SIMHASH_BITS):
        # Real fingerprints occupy [0, 2^60); a sentinel inside that
        # range (0 especially — the all-votes-negative fingerprint)
        # would silently merge genuine documents with empty ones.
        raise ValueError(
            f"empty_sentinel must lie outside [0, 2**{SIMHASH_BITS}) "
            f"(got {empty_sentinel}); use a negative value"
        )
    toks = _norm_words(F.col(text_col))
    t = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", _md5_hash64(F.col("tok")).alias("h"))
    )
    votes = t.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
            ).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim: Column = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    out = votes.select("doc_id", sim.alias("simhash"))
    if empty_sentinel is None:
        return out
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(out, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("simhash"), F.lit(empty_sentinel).cast("long")).alias(
            "simhash"
        ),
    )


def simhash_duplicate_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    empty_sentinel: int | None = None,
) -> DataFrame:
    """Documents sharing an identical 60-bit simhash.

    Empty/whitespace-only documents are EXCLUDED by default (they have
    no fingerprint — see :func:`simhash`); pass ``empty_sentinel`` to
    group them together under that fingerprint instead."""
    s = simhash(df, id_col, text_col, empty_sentinel=empty_sentinel)
    return (
        s.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs (a < b) whose simhashes differ in at most
    ``max_hamming`` of the 60 bits.

    Multi-probe banding bounds the pair search: the fingerprint splits
    into ``bands`` contiguous bit-bands and candidates must share at
    least one band verbatim — by pigeonhole this is *lossless* whenever
    ``max_hamming < bands`` (fewer flipped bits than bands means some
    band is untouched).  Candidates then pass an exact popcount check
    on the XOR.  One band equi-join — never globally quadratic — and
    every step (band extraction, xor, bit_count) is a built-in.

    Empty/whitespace-only documents never appear in any pair (they have
    no fingerprint — see :func:`simhash`); near-dup semantics for
    token-less docs are undefined, so no sentinel option here — use
    :func:`exact_duplicate_groups` for them.
    """
    if not max_hamming < bands:
        raise ValueError(
            "banding is only lossless when max_hamming < bands "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    if not 0 < bands <= SIMHASH_BITS:
        raise ValueError(f"bands must be in 1..{SIMHASH_BITS}")
    s = simhash(df, id_col, text_col)
    # Band b covers bits [b*60//bands, (b+1)*60//bands): an exact
    # partition of the 60 fingerprint bits.  A fixed ceil-width slicing
    # would give some band counts a constant-zero trailing band (bits
    # past 59) shared by EVERY document — the band join would silently
    # go globally quadratic.
    bounds = [b * SIMHASH_BITS // bands for b in range(bands + 1)]
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), bounds[b])
            .bitwiseAND(F.lit((1 << (bounds[b + 1] - bounds[b])) - 1))
            .alias("key"),
        )
        for b in range(bands)
    ]
    banded = s.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(y, ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
