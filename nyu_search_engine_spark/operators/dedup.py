"""Deduplication operators for large-scale training-data pipelines.

Not part of the reference (babysuse/NYU_search-engine indexes everything);
these are the standard corpus-hygiene operators a 100 TB ingest needs in
front of the indexer. All are pure DataFrame compositions (JVM-side,
codegen'd) — hashing uses md5/sha2 built-ins so every operator has an
exact DuckDB oracle; nothing here crosses the Python boundary.

Scale notes (10^12 rows):
  * exact:    one groupBy(sha256) shuffle; AQE handles residual skew.
  * minhash:  per-doc work only until the LSH band groupBy; band buckets
    bound the candidate blow-up (classic Broder/Indyk MinHash-LSH).
  * ngram-jaccard: the shingle self-join explodes on stop-shingles — use
    it post-LSH (verify candidates), never corpus-wide; df-cap the
    shingles (drop shingles in > max_df docs) to bound the join.
  * simhash:  linear; the 60-bit key groupBy is a hash shuffle.
  * embedding: exact pairwise is O(n^2) — keep for candidate verification;
    use similarity.lsh buckets for the corpus-wide pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORD_SAFE_BITS = 60  # 15 hex chars of md5 -> fits BIGINT exactly


def exact_dup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(id, content_sha256, canonical_id, group_size) — exact duplicate
    groups by content hash; canonical = min id."""
    hashed = df.select(
        F.col(id_col).alias("id"), F.sha2(F.col(content_col), 256).alias("content_sha256")
    )
    groups = hashed.groupBy("content_sha256").agg(
        F.min("id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return hashed.join(groups, "content_sha256").select(
        "id", "content_sha256", "canonical_id", "group_size"
    )


def shingles(df: DataFrame, id_col: str, tokens_col_name: str, n: int) -> DataFrame:
    """(id, shingle) — DISTINCT word n-gram shingles per doc, JVM-side."""
    toks = F.col(tokens_col_name)
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 16
) -> DataFrame:
    """(id, sig array<string>) — MinHash over md5(perm || '|' || shingle).

    String-min over hex md5 is a valid uniform permutation surrogate and
    is engine-portable (identical in Spark and DuckDB). sig[i] is the
    minimum under permutation i.

    Single-pass shape: all n_hashes permutation hashes are column
    expressions on the shingle row, folded by ONE groupBy(id) carrying
    n_hashes map-side-combined min aggregates — no row blow-up
    (the old form crossJoined x n_hashes and shuffled twice).
    """
    hashes = [
        F.md5(F.concat_ws("|", F.lit(str(p)), "shingle")).alias(f"h{p}")
        for p in range(n_hashes)
    ]
    mins = [F.min(f"h{p}").alias(f"m{p}") for p in range(n_hashes)]
    return (
        sh.select("id", *hashes)
        .groupBy("id")
        .agg(*mins)
        .select("id", F.array(*[f"m{p}" for p in range(n_hashes)]).alias("sig"))
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(id_a, id_b) distinct candidate pairs sharing >= 1 LSH band."""
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        )
                    ).alias("bkey"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    sh: DataFrame, threshold: float, max_shingle_df: int | None = None
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-set Jaccard >= threshold.

    Exact; O(pairs sharing a shingle). max_shingle_df drops stop-shingles
    to bound the self-join at scale (document the cap — it makes the
    result a lower bound for pairs glued only by stop-shingles).
    """
    if max_shingle_df is not None:
        keep = sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_df)
        sh = sh.join(keep.select("shingle"), "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(tf_df: DataFrame, bits: int = STOPWORD_SAFE_BITS) -> DataFrame:
    """(id, simhash bigint) — tf-weighted SimHash over md5 term hashes.

    Input: (id, term, tf). h(term) = first 15 hex chars of md5 as a 60-bit
    int; bit j of the fingerprint is sign(sum tf * (2*bit_j(h) - 1)).

    ONE shuffle, zero row blow-up: each bit's signed-tf total is a
    conditional-sum aggregate over the un-exploded (id, term, tf) rows —
    ``bits`` map-side-combined sums in a single groupBy(id), then the
    fingerprint word is assembled from the ``bits`` sum columns driver-free.
    (The old form crossJoined every row with ``bits`` bit indices and
    shuffled twice; at 10^12 rows that 60x shuffle is a real cluster bill.)
    """
    h = tf_df.select(
        "id", "tf",
        F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    sums = [
        F.sum(
            F.col("tf")
            * (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"w{j}")
        for j in range(bits)
    ]
    agg = h.groupBy("id").agg(*sums)
    word = F.lit(0).cast("bigint")
    for j in range(bits):
        word = word + F.when(
            F.col(f"w{j}") > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return agg.select("id", word.alias("simhash"))


def embedding_neardup_lsh_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float,
    n_planes: int = 4, seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine) near-dup pairs via hyperplane-LSH blocking —
    the corpus-scale path: only pairs whose sign-buckets are within
    Hamming distance 1 are scored (bucket equi-join on the probe
    expansion), so the join is bucket-local instead of O(n^2). Exact
    cosine on every emitted pair; deterministic planes => exact DuckDB
    oracle. Recall is bounded by the blocking (pairs differing in >1 sign
    bit are not candidates — that is the documented approximation).

    Sizing: within a bucket the join is still quadratic, so pick
    n_planes ~ ceil(log2(n_rows / target_bucket_rows)) to keep
    (n/2^n_planes)^2 * 2^n_planes = n^2 / 2^n_planes comparisons bounded
    — at 10^9 rows, n_planes=20 caps the candidate volume near 10^12
    instead of 10^18. Near-dup pairs are ~parallel vectors, so recall
    stays high as planes grow (each plane splits a near-dup pair with
    probability ~angle/pi ~ 0); the default n_planes=4 is demo-scale.
    """
    from .similarity import hyperplanes, random_hyperplane_buckets

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    planes = hyperplanes(int(first["d"]), n_planes, seed)
    base = random_hyperplane_buckets(emb, id_col, vec_col, planes) \
        .withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    # probe expansion: each row joins under its own bucket and every
    # Hamming-1 neighbor, so one equi-join on probe covers distance <= 1.
    # A row's probe values are all distinct and the b side contributes one
    # row per (id, bucket), so each ordered pair matches exactly once; the
    # id_a < id_b filter then keeps one row per unordered pair — no
    # dedup pass needed.
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
    )
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("norm").alias("na"), F.explode(probes).alias("probe"),
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("norm").alias("nb"), F.col("bucket").alias("probe"),
    )
    return (
        a.join(b, "probe")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def simhash_pairs(
    fp: DataFrame, max_hamming: int = 3, bits: int = STOPWORD_SAFE_BITS,
) -> DataFrame:
    """(id_a, id_b, hamming) — all pairs with Hamming(simhash) <=
    ``max_hamming``, from a (id, simhash) fingerprint table.

    Pigeonhole band blocking (Manku/Jain/Das Sarma, WWW'07 web near-dup
    detection): split the ``bits``-bit fingerprint into ``max_hamming+1``
    contiguous bands — two fingerprints within ``max_hamming`` differing
    bits MUST agree exactly on at least one band, so the (band, band
    bits) equi-join is a COMPLETE candidate generator, not an
    approximation; an exact popcount-of-xor then verifies each
    candidate. Scale shape: linear explode to k+1 rows per doc, one
    bucket-local equi-join (no O(n^2)); clusters of truly identical
    fingerprints are the only quadratic pockets, exactly like the
    exact-dedup groupBy. Larger ``max_hamming`` widens recall but
    shrinks bands — keep k*log2(n) well under ``bits`` so random
    collisions stay rare (k=3 over 60 bits: 15-bit bands)."""
    nb = max_hamming + 1
    w = -(-bits // nb)  # band width, last band may be narrower
    bands = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("simhash"), j * w)
            .bitwiseAND(F.lit((1 << min(w, bits - j * w)) - 1))
            .alias("bkey"),
        )
        for j in range(nb)
    ])
    banded = fp.select(
        "id", "simhash", F.explode(bands).alias("bk")
    ).select("id", "simhash",
             F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("ha"), F.col("b.simhash").alias("hb"))
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node's strictly-larger neighbors are
    re-attached to the minimum of its closed neighborhood."""
    nbrs = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = (
        nbrs.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("src", "mn").alias("m"))
    )
    return (
        nbrs.filter(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over edges oriented large->small (the
    large-star output invariant): every node and its smaller neighbors
    attach to the neighborhood minimum."""
    m = e.groupBy("src").agg(F.min("dst").alias("m"))
    arms = (
        e.join(m, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    selfs = m.select("src", F.col("m").alias("dst"))  # m < src always
    return arms.union(selfs).distinct()


def connected_components(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component =
    the smallest node id reachable from it — the canonical member of a
    near-dup cluster.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — the standard
    shuffle-only CC algorithm: no driver-side graph, no vertex-count
    state, converges in O(log^2 n) rounds (2-3 in practice for near-dup
    graphs, whose components are small and dense). Each round is two
    groupBy-min + join shuffles over the CURRENT edge set, which only
    shrinks (both stars strictly reduce the potential). Per round the
    plan is cut with ``localCheckpoint`` — iterative DataFrames
    otherwise stack lineage until planning dominates; on a real cluster
    with a configured ``setCheckpointDir`` the reliable ``checkpoint``
    is used instead (fault tolerance across a multi-hour 10^12-edge
    run). Convergence is detected from two scalar aggregates (count +
    xxhash64 checksum), never a collect of the edge set.
    """
    e = (
        edges.select(
            F.greatest(
                F.col(src_col).cast("long"), F.col(dst_col).cast("long")
            ).alias("src"),
            F.least(
                F.col(src_col).cast("long"), F.col(dst_col).cast("long")
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    reliable = e.sparkSession.sparkContext.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable \
            else df.localCheckpoint(eager=True)

    nodes = _cut(nodes)  # derived from pre-loop e; pin it before e churns
    prev: tuple | None = None
    for _ in range(max_rounds):
        e = _cut(_small_star(_large_star(e)))
        sig = e.agg(
            F.count("*").alias("n"),
            # decimal sum: a long sum of 2^63-range hashes overflows
            # under ANSI mode; decimal(38,0) holds ~10^19 edges' worth
            F.sum(F.xxhash64("src", "dst").cast("decimal(20,0)")).alias("chk"),
        ).first()
        cur = (sig["n"], sig["chk"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")
    # converged edge set is a star forest: src -> component minimum
    comp = e.groupBy("src").agg(F.min("dst").alias("component"))
    return (
        nodes.join(comp, nodes["id"] == comp["src"], "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )


def neardup_clusters(
    pairs: DataFrame, all_docs: DataFrame, id_col: str,
    pair_a: str = "id_a", pair_b: str = "id_b",
) -> DataFrame:
    """(id, cluster_id, cluster_size) for EVERY doc — the deletion-set
    builder a training-data dedup pipeline actually needs: candidate
    PAIRS (from MinHash-LSH / SimHash / embedding blocking) glued into
    clusters by connected components, singletons kept as their own
    cluster, cluster_id = min doc id (the canonical to keep; every other
    member is the deletion set). Cost beyond the CC rounds: one left
    join (docs x tiny component map) + one groupBy(cluster_id) — both
    plain shuffles, no skew beyond the duplicate-cluster sizes
    themselves."""
    cc = connected_components(pairs, pair_a, pair_b).select(
        F.col("id").alias("_cc_id"), "component"
    )
    labeled = (
        all_docs.select(F.col(id_col).cast("long").alias("id"))
        .join(cc, F.col("id") == F.col("_cc_id"), "left")
        .select("id", F.coalesce("component", "id").alias("cluster_id"))
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return labeled.join(sizes, "cluster_id").select(
        "id", "cluster_id", "cluster_size")


def embedding_neardup_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """(id_a, id_b, cosine) exact pairwise cosine >= threshold (double).

    O(n^2) verification operator — at corpus scale run it only on LSH
    bucket candidates (similarity.random_hyperplane_buckets)."""
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
    ).withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
