"""Deduplication operators (north-star surface, BASELINE.json):
exact, MinHash+LSH near-dup, SimHash, n-gram Jaccard.

Design for 100 TB (the whole point of each shape here):

* ``exact_dedup``: hash-groupBy on a fingerprint of the dedup key -- one
  shuffle keyed by a 60-bit hash, never by the full text; group state is
  tiny (min doc_id + count).
* MinHash+LSH: the classic shingle -> K minhashes -> B bands -> bucket
  self-join pipeline. The self-join is on (band_idx, band_key), NOT a
  cross join -- candidate generation is |bucket|^2 per bucket, and the
  expensive exact-Jaccard verify runs only on candidates. All hashing is
  per-row projection (no Python); the only shuffles are the band-bucket
  join and the final distinct.
* SimHash: 32 bit-vote aggregations per doc from token hashes -- a single
  groupBy(doc) after an explode(distinct tokens); near-identical docs get
  equal/near-equal signatures.

Hashes use the md5-based portable hash (functions/text.py:md5_hash32) so
every stage is verifiable against the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, md5_hash32, shingles, tokenize
from ..sources.readers import spread


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per normalized-text fingerprint.

    Returns (fingerprint, keep_id, n_dups) per group -- deterministic
    regardless of partitioning (min, not first).
    """
    return (
        df.select(doc_fingerprint(F.col(text_col)).alias("fp"), F.col(id_col).alias("doc_id"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


# MinHash permutation family: h_i(x) = (A_i * base(x) + B_i) mod P with one
# shared md5 base hash -- 16x cheaper than 16 independent md5 passes, and
# trivially mirrored in the oracle SQL. P is the smallest prime > 2^32;
# A_i,B_i < 2^20 keep A*base < 2^52, safely inside exact int64 arithmetic.
MINHASH_PRIME = 4_294_967_311
MINHASH_A = [709 + 31 * i for i in range(64)]
MINHASH_B = [127 + 97 * i for i in range(64)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: ``sig`` array<long> of length num_hashes
    over distinct word-``shingle_n``-gram shingles."""
    # Two-step projection ON PURPOSE: ``base_h`` is referenced by all
    # num_hashes permutations below; keeping it a separate (expensive,
    # multiply-referenced) projection stops CollapseProject from re-inlining
    # the md5 pass 16x -- one md5 per shingle instead of num_hashes.
    staged = (
        spread(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(shingles(tokenize(F.col(text_col)), shingle_n)).alias("shingle_set"),
        )
        .withColumn("base_h", F.transform("shingle_set", lambda x: md5_hash32(x)))
    )

    def perm_min(i: int):
        a, b = MINHASH_A[i], MINHASH_B[i]
        # single-arg lambda: a 2-arg HOF lambda would receive the array
        # index as its second argument and clobber a captured default
        return F.array_min(
            F.transform("base_h", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME))
        )

    sig = F.array(*[perm_min(i) for i in range(num_hashes)])
    return staged.select("doc_id", "shingle_set", sig.alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any full band of the signature become a
    candidate pair. Output: distinct (doc_a, doc_b), doc_a < doc_b.

    ``bucket_cap`` is the operator-level answer to the one skew mode AQE
    cannot fix (VERDICT r3 "Next round" item 3): a HOT BUCKET. AQE's
    skew-split parallelizes an oversized join partition, but a bucket of n
    near-identical docs still EMITS n^2/2 pairs -- 10k duplicated docs is
    50M pairs from one key, and at 100 TB a viral boilerplate page is 10M
    docs = 5*10^13 pairs, which no amount of task splitting absorbs.
    Buckets larger than the cap therefore switch to a STAR topology: every
    member pairs with the bucket's minimum doc_id only (n-1 pairs).
    That bounds candidate output at O(cap * n) while preserving exactly
    what dedup consumes -- connectivity (the star keeps every member
    reachable from the representative, so near-dup CLUSTERS (d07) are
    unchanged) -- at the cost of pair-list completeness inside hot buckets
    (a pair of docs that only ever co-occur in capped buckets and are both
    non-representative is not emitted). Default None = exact all-pairs,
    which is what the d02 oracle checks.
    """
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")

    if bucket_cap is not None:
        # Window over the bucket key: same hash partitioning the self-join
        # needs anyway, so Catalyst reuses the exchange instead of adding a
        # shuffle.
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        banded = (
            banded.withColumn("_bn", F.count(F.lit(1)).over(w))
            .withColumn("_brep", F.min("doc_id").over(w))
        )
        small = banded.filter(F.col("_bn") <= bucket_cap)
        star = (
            banded.filter(
                (F.col("_bn") > bucket_cap) & (F.col("doc_id") != F.col("_brep"))
            )
            .select(F.col("_brep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )
        a = small.alias("a")
        b = small.alias("b")
        all_pairs = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        )
        return all_pairs.unionByName(star).distinct()

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH candidates -> exact n-gram
    Jaccard verify. Returns (doc_a, doc_b, jaccard) with jaccard rounded to
    4 (computed on exact distinct-shingle sets, so no approximation in the
    reported value -- MinHash only prunes the pair space).

    ``bucket_cap``: see lsh_candidate_pairs -- the hot-bucket guard for
    duplicate-storm corpora; None keeps the exact all-pairs semantics the
    d02 oracle checks."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n).cache()
    cands = lsh_candidate_pairs(sigs, bands, num_hashes // bands, bucket_cap=bucket_cap)
    sets_ = sigs.select("doc_id", "shingle_set")
    verified = (
        cands.join(sets_.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingle_set", "set_a"), "doc_a")
        .join(sets_.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingle_set", "set_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("set_a", "set_b"))
                / F.size(F.array_union("set_a", "set_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def ngram_jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT n-gram-Jaccard self-join via prefix filtering (PPJoin-style).

    Unlike MinHash (probabilistic pruning, can miss pairs), this finds
    EVERY pair with Jaccard >= threshold: a pair can only match if the
    rare-first prefixes of their shingle sets (first ``|s| - ceil(t*|s|)
    + 1`` shingles when globally ordered by ascending document frequency,
    shingle as tie-break) share at least one shingle. The inverted index
    is built over prefixes only -- posting lists shrink by factor ~(1-t),
    and orders by rarity, so hot shingles never index anything.

    Scale shape (100 TB): the shingle-set build is spread across the
    cluster up front (``spread``, a no-op on wide scans) and persisted -- it is probed
    three times (prefix build + both verify sides) and recomputing the
    string n-gram expansion is the dominant CPU cost. Document frequency
    comes from a window count over the exploded shingles (ONE shuffle,
    where groupBy+join-back would shuffle the same data twice); the
    per-doc rarity rank is a second shuffle; the prefix equi-join never
    degenerates to a cross join; the exact verify touches candidate
    pairs only.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded 4.
    """
    from pyspark.sql import Window

    sets_ = (
        spread(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(shingles(tokenize(F.col(text_col)), shingle_n)).alias("s"),
        )
        # one row per document IDENTITY -- same completeness argument as
        # ngram_prefix_index: duplicate rows inflate the per-doc_id
        # prefix window's rn by x(copies) and truncate the pruning
        # budget, silently LOSING true pairs (the r13 dupx-x10 sweep
        # caught d04 dropping 4 near-dup pairs this way; at x100 the
        # over-bound gates happened to re-route around it)
        .dropDuplicates(["doc_id", "s"])
        .withColumn("sz", F.size("s"))
        .persist()
    )

    exploded = sets_.select("doc_id", "sz", F.explode("s").alias("shingle"))
    w_df = Window.partitionBy("shingle")
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
    prefix = (
        exploded.withColumn("df", F.count(F.lit(1)).over(w_df))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
        .select("doc_id", "shingle", "rn", "sz")
        # persisted: the self-join below broadcasts one side, so WITHOUT
        # this both sides re-execute the whole two-shuffle window pipeline
        # (no ReusedExchange across a BroadcastExchange boundary) -- r16
        # measured ~2x on the full query. The prefix table is the PRUNED
        # slice of the exploded shingles (factor ~(1-t)), strictly smaller
        # than the sets_ cache above, and spills via MEMORY_AND_DISK.
        .persist()
    )

    # PPJoin pruning predicates. Both are safe for the FIRST common prefix
    # shingle of any true match (overlap o <= min remaining suffix length),
    # so filter-then-distinct loses no >=threshold pair:
    #   length: a match needs t*max(sz) <= min(sz);
    #   positional: o >= ceil(t/(1+t)*(sz_a+sz_b)) but
    #               o <= 1 + min(sz_a-rn_a, sz_b-rn_b).
    a, b = prefix.alias("a"), prefix.alias("b")
    min_overlap = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.sz") + F.col("b.sz"))
    )
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.lit(threshold) * F.greatest("a.sz", "b.sz")
                <= F.least("a.sz", "b.sz")
            )
            & (
                F.lit(1)
                + F.least(
                    F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")
                )
                >= min_overlap
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return (
        cands.join(sets_.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("set_a")), "doc_a")
        .join(sets_.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("set_b")), "doc_b")
        # filter on the UNROUNDED ratio (the d04 oracle's WHERE clause
        # does too); rounding only for presentation -- filtering on the
        # rounded value would admit pairs with true jaccard in
        # [t - 5e-5, t) that the oracle rejects (needs >= 10k-shingle
        # unions to fire, but the semantics must match at any scale)
        .withColumn(
            "_j",
            F.size(F.array_intersect("set_a", "set_b"))
            / F.size(F.array_union("set_a", "set_b")),
        )
        .filter(F.col("_j") >= threshold)
        .select("doc_a", "doc_b", F.round("_j", 4).alias("jaccard"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-doc SimHash over distinct tokens: bit j is set when the sum of
    per-token votes (+1 if the token hash has bit j, else -1) is positive.

    Shape: explode distinct tokens -> one groupBy(doc) with ``bits``
    conditional-sum aggregates -> recombine. One shuffle keyed by doc id.
    """
    toks = (
        spread(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("token"),
        )
        .withColumn("h", md5_hash32(F.col("token")))
    )

    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << j)) > 0, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)

    combined = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        combined = term if combined is None else combined + term
    return agg.select("doc_id", combined.cast("long").alias("simhash"))


def edit1_neighborhood_join(
    df: DataFrame, id_col: str, name_col: str, bucket_cap: int | None = None
) -> DataFrame:
    """Fuzzy self-join at edit distance <= 1 via the FastSS deletion
    neighborhood: two strings are within one edit (insert / delete /
    substitute) ONLY IF they share a member of {s} + D1(s) (every
    1-deletion variant), so the equi-join on variants is a complete
    candidate generator and ``levenshtein`` verifies exactly -- never a
    cross join, and unlike LSH it cannot miss a pair.

    Returns distinct (id_a, id_b, name_a, name_b, dist) with id_a < id_b.

    Scale shape: |D1(s)| = len(s)+1 variants per row, so the exploded
    relation is O(total chars); the shuffle keys on the variant string and
    bucket sizes track how many strings collapse onto one deletion (the
    fuzzy-cluster size), not corpus size. The levenshtein verify runs
    JVM-side on candidate pairs only.

    ``bucket_cap``: hot-variant guard (same rationale and star topology as
    lsh_candidate_pairs.bucket_cap -- a value repeated n times emits n^2/2
    candidates from one variant key, which AQE can parallelize but not
    shrink). Variants shared by more than the cap pair every member with
    the bucket's min id only: connectivity within a fuzzy cluster is
    preserved (all members verify at dist<=1 against the representative
    when they are true duplicates), pair-list completeness inside hot
    buckets is traded away. None (default) = exact, the d08 oracle
    semantics.
    """
    variants = F.array_distinct(
        F.concat(
            F.array(F.col("_name")),
            F.expr(
                "transform(sequence(1, length(_name)), i -> "
                "concat(substring(_name, 1, i-1), substring(_name, i+1, 8192)))"
            ),
        )
    )
    # spread before the O(total chars) deletion-variant explode: a
    # replay-sized scan is 1 split and would serialize it on one core
    # (no-op on real multi-split scans)
    ex = spread(
        df.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_name"))
    ).select("_id", "_name", F.explode(variants).alias("_v"))

    if bucket_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_v")
        ex2 = (
            ex.withColumn("_bn", F.count(F.lit(1)).over(w))
            .withColumn("_rid", F.min("_id").over(w))
            .withColumn("_rname", F.min_by("_name", "_id").over(w))
        )
        small = ex2.filter(F.col("_bn") <= bucket_cap)
        star = (
            ex2.filter((F.col("_bn") > bucket_cap) & (F.col("_id") != F.col("_rid")))
            .select(
                F.col("_rid").alias("id_a"),
                F.col("_id").alias("id_b"),
                F.col("_rname").alias("name_a"),
                F.col("_name").alias("name_b"),
            )
        )
        a, b = small.alias("a"), small.alias("b")
        all_pairs = a.join(
            b, (F.col("a._v") == F.col("b._v")) & (F.col("a._id") < F.col("b._id"))
        ).select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._name").alias("name_a"),
            F.col("b._name").alias("name_b"),
        )
        cands = all_pairs.unionByName(star).distinct()
    else:
        # POSITION-AUGMENTED verification (the FastSS paper's trick): a
        # candidate pair is within edit distance 1 IFF one side matched
        # through its identity variant (equality / insertion / deletion)
        # OR both deletions were at the SAME position (substitution
        # there). Deleting the same position from both strings leaving
        # identical remainders means they can differ nowhere else -- so
        # the verify is two integer compares and one string equality,
        # replacing a per-candidate levenshtein that dominated the
        # operator (measured ~5.4s of d08's 8.5s at sf0.1).
        var_pos = F.concat(
            F.array(F.struct(F.col("_name").alias("_v"), F.lit(0).alias("_p"))),
            F.expr(
                "transform(sequence(1, length(_name)), i -> "
                "struct(concat(substring(_name, 1, i-1), "
                "substring(_name, i+1, 8192)) as _v, i as _p))"
            ),
        )
        exp = spread(
            df.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_name"))
        ).select("_id", "_name", F.explode(var_pos).alias("_s"))
        exp = exp.select(
            "_id", "_name", F.col("_s._v").alias("_v"), F.col("_s._p").alias("_p")
        )
        a, b = exp.alias("a"), exp.alias("b")
        cands = (
            a.join(
                b, (F.col("a._v") == F.col("b._v")) & (F.col("a._id") < F.col("b._id"))
            )
            .filter(
                (F.col("a._p") == 0) | (F.col("b._p") == 0)
                | (F.col("a._p") == F.col("b._p"))
            )
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.col("a._name").alias("name_a"),
                F.col("b._name").alias("name_b"),
            )
        )
        return cands.withColumn(
            "dist",
            F.when(F.col("name_a") == F.col("name_b"), 0).otherwise(1).cast("int"),
        ).distinct()
    return cands.select(
        "id_a", "id_b", "name_a", "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= 1)


def lsh_probe_index(
    index_sigs: DataFrame,
    probe_sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    index_bucket_cap: int | None = None,
) -> DataFrame:
    """Incremental-ingestion LSH: band a PROBE batch against an EXISTING
    corpus index instead of self-joining the whole corpus. Output:
    distinct (doc_id, dup_of) candidate pairs, probe-side id first.

    This is the shape that makes dedup INCREMENTAL at 100 TB: the
    existing corpus is banded once (an index table you persist, bucketed
    by (band_idx, band_key)); each new batch bands only its own docs and
    equi-joins the index -- cost proportional to the BATCH, not the
    corpus. The join is the same band-bucket equi-join as
    lsh_candidate_pairs, so AQE skew handling applies unchanged.

    ``index_bucket_cap`` is the probe-path twin of the self-join's
    star-topology cap: a VIRAL band (thousands of near-identical docs
    already indexed) would otherwise produce |bucket| x |probe-hits|
    candidates. Capped, each probe doc compares against at most ``cap``
    representatives per bucket (lowest dup_of = oldest first,
    deterministic) -- O(cap * batch) candidates. Match quality is
    preserved for the case the cap exists for: bucket members share the
    band signature, so a probe doc that truly matches the bucket matches
    its representatives. None = complete candidates (the oracle-exact
    catalog setting; the cap is for planted-skew regimes).

    One-shot shape (d10: one probe batch, band both sides inline and
    let Catalyst pick the join). A STREAM probing the same index every
    micro-batch should instead band the index ONCE with
    ``lsh_band_index`` and call ``lsh_probe_banded`` per batch, which
    also broadcasts the (small) banded batch so the persistent index
    table never shuffles.
    """
    probe_b = _banded(probe_sigs, "doc_id", bands, rows_per_band)
    index_b = _cap_buckets(
        _banded(index_sigs, "dup_of", bands, rows_per_band), index_bucket_cap
    )
    return (
        probe_b.join(index_b, ["band_idx", "band_key"])
        .select("doc_id", "dup_of")
        .distinct()
    )


def _banded(
    sigs: DataFrame, id_out: str, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band_idx, band_key) posting rows: the signature sliced
    into ``bands`` runs of ``rows_per_band`` hashes, each run rendered
    as a comma-joined key (exact-equality bucketing, no hashing loss)."""
    return sigs.select(
        F.col("doc_id").alias(id_out),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select(id_out, "band.band_idx", "band.band_key")


def _cap_buckets(index_b: DataFrame, index_bucket_cap: int | None) -> DataFrame:
    if index_bucket_cap is None:
        return index_b
    # representative selection per bucket: the window sorts only ids
    # within one bucket (O(H log H) of 8-byte rows), which replaces
    # the H x P pair blow-up the join would otherwise emit
    from pyspark.sql import Window

    w = Window.partitionBy("band_idx", "band_key").orderBy("dup_of")
    return (
        index_b.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= index_bucket_cap)
        .drop("rn")
    )


def lsh_band_index(
    index_sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    index_bucket_cap: int | None = None,
) -> DataFrame:
    """Static side of STREAMING LSH dedup: the banded posting table of
    the existing corpus, built ONCE and materialized (localCheckpoint)
    so micro-batches probe it without re-banding -- the
    ``ngram_prefix_index`` treatment for the MinHash family. At 100 TB
    this is a persistent table bucketed by (band_idx, band_key); new
    docs APPEND their band rows."""
    return _cap_buckets(
        _banded(index_sigs, "dup_of", bands, rows_per_band), index_bucket_cap
    ).localCheckpoint(eager=True)


def lsh_probe_banded(
    index_banded: DataFrame,
    probe_sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Per-micro-batch probe against an ``lsh_band_index`` table: band
    only the batch and equi-join the pre-banded index. With
    ``broadcast_probe`` the (|batch| x bands)-row probe side is
    broadcast so the persistent index NEVER shuffles -- callers gate the
    flag on batch size exactly like ``ngram_probe_index``'s sum(psz)
    probe (an earliest-offsets backfill batch = the whole topic; the
    shuffled fallback is result-identical). Returns distinct
    (doc_id, dup_of) candidate pairs, probe id first."""
    probe_b = _banded(probe_sigs, "doc_id", bands, rows_per_band)
    if broadcast_probe:
        probe_b = F.broadcast(probe_b)
    return (
        index_banded.join(probe_b, ["band_idx", "band_key"])
        .select("doc_id", "dup_of")
        .distinct()
    )


def ngram_prefix_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Static side of INCREMENTAL exact n-gram-Jaccard dedup: the
    ``ngram_jaccard_join`` shingle sets + rarity-ordered prefix inverted
    index, factored out so a stream can build them ONCE and probe per
    micro-batch (the d10/lsh_probe_index ingestion shape, but with the
    exact PPJoin guarantee instead of MinHash's probabilistic one).

    Returns ``(sets, prefix, dfreq)``: ``sets`` is (doc_id, s, sz) with
    the distinct shingle array; ``prefix`` is (doc_id, shingle, rn, sz)
    restricted to each doc's first ``sz - ceil(t*sz) + 1`` shingles in
    ascending (document frequency, shingle) order, ``rn`` the 1-based
    position in that order; ``dfreq`` is the (shingle, df) document-
    frequency table the order derives from -- probes reuse it so BOTH
    join sides prune under the same global order (a shingle the index
    has never seen gets df 0, i.e. rarest, which extends the order
    without disturbing it). All three come back MATERIALIZED
    (localCheckpoint, in dependency order so the prefix derivation reads
    the checkpointed sets instead of re-expanding the n-grams): they are
    probed once per micro-batch, forever. At 100 TB these are tables you
    persist, bucketed by doc_id / shingle; new docs APPEND to sets and
    prefix -- df counts only grow, which can lengthen ideal prefixes of
    OLD docs, but a stale (longer-than-ideal) prefix only admits extra
    candidates, never loses a pair, so periodic recompaction is a cost
    optimization, not a correctness event."""
    from pyspark.sql import Window

    sets_ = (
        spread(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(shingles(tokenize(F.col(text_col)), shingle_n)).alias("s"),
        )
        # one row per document IDENTITY: exact-duplicate input rows (the
        # r13 dupx variant, 100 copies per doc) otherwise inflate the
        # per-doc_id prefix window's rn by x(copies) while sz stays
        # per-row, TRUNCATING the prefix to 1/copies of its pruning
        # budget -- which silently LOSES true near-dup pairs (the worst
        # dedup failure). dropDuplicates on (doc_id, s) collapses exact
        # copies; conflicting texts under one id stay (caller's contract
        # violation, and the exact verify stays correct for whichever
        # wins the prefix window).
        .dropDuplicates(["doc_id", "s"])
        .withColumn("sz", F.size("s"))
        .localCheckpoint(eager=True)
    )
    exploded = sets_.select("doc_id", "sz", F.explode("s").alias("shingle"))
    dfreq = (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
    prefix = (
        exploded.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
        .select("doc_id", "shingle", "rn", "sz")
        .localCheckpoint(eager=True)
    )
    return sets_, prefix, dfreq


# Per-batch broadcast bound for ngram_probe_index (the d05/matmul guard
# regime, see similarity.MATMUL_QUERY_ROW_LIMIT): the probe side of the
# posting-list join is broadcast so the persistent index never shuffles --
# the right shape for steady-state micro-batches, but an earliest-offsets
# backfill makes batch 1 the whole topic (the reference's update+earliest
# baseline replays 146,626 messages in its first micro-batch), and at
# 100 TB that first batch would blow the broadcast. A scalar sum(psz)
# over the checkpointed per-doc rows decides (exact exploded-row count
# without materializing an explode): broadcast below the bound, plain
# shuffled joins above it (identical results -- AQE picks the join
# strategy for the oversized batch). ~2M shingle rows of (long, int,
# short string, int) is tens of MB, well inside executor memory.
PROBE_BROADCAST_SHINGLE_LIMIT = 2_000_000

# Same bound, same units (exploded shingle rows), for the CANDIDATE-side
# broadcast inside ngram_probe_index: that payload is one probe shingle
# array per (probe, index-candidate) pair, so its size tracks corpus-side
# collision multiplicity rather than batch size and needs its own gate (a
# tiny batch against a dup-heavy corpus can exceed it while the batch
# gate passes). Separate name so tests can force exactly one fallback.
PROBE_BROADCAST_CAND_SHINGLE_LIMIT = 2_000_000


def ngram_probe_index(
    index_sets: DataFrame,
    index_prefix: DataFrame,
    index_dfreq: DataFrame,
    probe_docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    with_cache: bool = False,
) -> DataFrame:
    """Probe a batch of new docs against an ``ngram_prefix_index`` --
    COMPLETE at the threshold with BOTH sides prefix-pruned: the probe
    side orders its shingles under the index's own (df, shingle) global
    order (unseen shingles take df 0 = rarest, extending the order
    without disturbing it), so the classic PPJoin guarantee applies
    cross-side -- a pair with J >= t shares a shingle inside both docs'
    ``|s| - ceil(t*|s|) + 1`` prefixes, and the length / positional
    predicates below are each safe for the first common prefix shingle
    (same argument as the batch self-join in ``ngram_jaccard_join``).

    Cost tracks the batch: probe shingle sets are built once, ranked
    under the broadcast-size dfreq order, prefix-pruned, and (below
    ``PROBE_BROADCAST_SHINGLE_LIMIT``) BROADCAST into the posting-list
    join so the persistent index tables never shuffle (the stream-static
    join shape); a backfill-sized batch falls back to plain shuffled
    joins with identical results. Returns (doc_id, dup_of, jaccard) --
    probe id first, every >= threshold pair, rounded 4.

    ``with_cache=True`` returns ``(result, pair_cache)`` instead: the
    per-batch persisted pair list, which the CALLER must ``unpersist()``
    right after materializing the result -- the ownership handoff a
    long-running stream needs (s33 holds one cached pair list per
    un-GC'd batch otherwise). With the default False the cache is left
    to the ContextCleaner's GC cycle (fine for one-shot batch callers
    that materialize promptly); r12 ADVICE killed the old private-
    attribute handoff, which any intermediate transformation dropped."""
    from pyspark.sql import Window

    p_sets = (
        probe_docs.select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(shingles(tokenize(F.col(text_col)), shingle_n)).alias("p"),
        )
        # duplicate probe rows would truncate the probe-side prefix the
        # same way duplicate index rows truncate the index prefix (see
        # ngram_prefix_index) -- one row per probe identity
        .dropDuplicates(["doc_id", "p"])
        .withColumn("psz", F.size("p"))
        .localCheckpoint(eager=True)
    )
    # Batch gate: sum(psz) over the checkpointed batch IS the exploded
    # shingle-row count the old limit+1 probe approximated -- one scalar
    # agg over materialized per-doc rows (size is array metadata, the
    # arrays themselves are never exploded), exact, and O(#docs) instead
    # of O(#shingle rows) even on a backfill batch (r12, VERDICT task 3).
    tot = (
        p_sets.agg(F.coalesce(F.sum("psz"), F.lit(0)).alias("t")).collect()[0]["t"]
    )
    over = tot > PROBE_BROADCAST_SHINGLE_LIMIT
    maybe_bcast = (lambda d: d) if over else F.broadcast
    wp = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
    p_prefix = (
        p_sets.select("doc_id", "psz", F.explode("p").alias("shingle"))
        .join(index_dfreq, "shingle", "left")
        .withColumn("df", F.coalesce("df", F.lit(0)))
        .withColumn("prn", F.row_number().over(wp))
        .filter(
            F.col("prn") <= F.col("psz") - F.ceil(F.lit(threshold) * F.col("psz")) + 1
        )
        .select("doc_id", "psz", "shingle", "prn")
    )
    min_overlap = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("psz") + F.col("sz"))
    )
    cands = (
        index_prefix.withColumnRenamed("doc_id", "dup_of")
        .join(maybe_bcast(p_prefix), "shingle")
        .filter(
            (F.lit(threshold) * F.greatest("psz", "sz") <= F.least("psz", "sz"))
            & (
                F.lit(1)
                + F.least(F.col("sz") - F.col("rn"), F.col("psz") - F.col("prn"))
                >= min_overlap
            )
        )
        .select("doc_id", "dup_of")
        .distinct()
    )
    # The verify join's broadcast payload is one probe-shingle ARRAY per
    # (probe, index-candidate) pair -- its row count scales with how many
    # index docs each probe collides with (corpus-side multiplicity), NOT
    # with the batch, so the batch-level gate above says nothing about it:
    # on a dup-heavy corpus a tiny batch can match a corpus-scale number
    # of index docs and blow the driver. PERSIST the pair list (two longs
    # per row) so the exact-payload gate job below -- a scalar sum of the
    # probe shingle-set sizes over the pairs, never touching an array --
    # doubles as the cache fill: the posting join + distinct run exactly
    # once, the verify join reads the cached pairs, and the r11 extra
    # eager-checkpoint job per call is gone (r12, VERDICT task 3; the
    # ContextCleaner unpersists the blocks when the batch's frames are
    # GC'd, same lifecycle the old localCheckpoint relied on). Over-bound
    # candidate sets take the shuffled join with identical results.
    cands = cands.persist()
    payload = (
        cands.join(p_sets.select("doc_id", "psz"), "doc_id")
        .agg(F.coalesce(F.sum("psz"), F.lit(0)).alias("n"))
        .collect()[0]["n"]
    )
    maybe_bcast_c = (
        F.broadcast if payload <= PROBE_BROADCAST_CAND_SHINGLE_LIMIT else (lambda d: d)
    )
    out = (
        index_sets.select(F.col("doc_id").alias("dup_of"), F.col("s").alias("i"))
        .join(maybe_bcast_c(cands.join(p_sets.select("doc_id", "p"), "doc_id")), "dup_of")
        # filter on the UNROUNDED ratio (the oracle's WHERE clause does
        # too); rounding only for presentation -- filtering on the rounded
        # value would admit pairs in [t - 5e-5, t) the oracle rejects
        .withColumn(
            "_j", F.size(F.array_intersect("p", "i")) / F.size(F.array_union("p", "i"))
        )
        .filter(F.col("_j") >= threshold)
        .select("doc_id", "dup_of", F.round("_j", 4).alias("jaccard"))
    )
    if with_cache:
        return out, cands
    return out
