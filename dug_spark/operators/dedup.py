"""Deduplication operators for the training-data pipeline.

Not present in the reference (Dug never dedupes documents — closest analogs
are its identifier-merge at parsers/_base.py:99-104 and answer-id dedup at
:106-110); required here as first-class engine ops for 100 TB corpus work.

Families:
- exact:   content-hash groupBy (one shuffle on the hash)
- shingle: n-gram (word shingle) Jaccard pairs — candidate generation by
  shingle equi-join, so cost is Σ bucket² over shingle buckets, not n²
- minhash: MinHash + LSH banding — signature via xxhash64 permutations,
  band-bucket equi-join, verify candidates with true Jaccard
- simhash: 64-bit simhash with banded matching for Hamming-distance pairs
- embedding: cosine near-dup over an embedding column

All are pure DataFrame plans (JVM-side, whole-stage codegen) except the
minhash signature fold which uses built-in higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by content hash; keep min id + copy count."""
    return df.groupBy(F.md5(F.encode(text_col, "utf-8")).alias("fp")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def _shingles(text_col: str, k: int):
    """Distinct k-word shingles of a space-tokenized text column.

    Docs with fewer than k words yield an empty array: without the guard,
    ``sequence(0, -1)`` evaluates to ``[0, -1]`` and the inner ``slice``
    throws INVALID_PARAMETER_VALUE.START on the -1 index."""
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size(split({text_col}, ' ')) >= {k} THEN "
            f"transform(sequence(0, size(split({text_col}, ' ')) - {k}),"
            f" i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {k}))) "
            f"ELSE array() END"
        ).cast("array<string>")
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Document pairs with shingle-set Jaccard ≥ threshold.

    Output: (id_a, id_b, jaccard) with id_a < id_b.  Candidate pairs come
    from the shingle equi-join (docs sharing ≥1 shingle), so disjoint docs
    never meet — at corpus scale, pair with minhash banding first to cap
    bucket sizes.
    """
    # parallelism floor: the shingle explode is the expensive narrow stage
    # and a small-file scan collapses to 1 partition (no-op at corpus scale)
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    sh = (
        df.select(F.col(id_col).alias("doc"), F.explode(_shingles(text_col, shingle)).alias("s"))
        .where(F.length("s") > 0)
        .distinct()
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc").alias("id_a"), "s")
    b = sh.select(F.col("doc").alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))
    j = F.col("inter") * 1.0 / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(j >= threshold)
        .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
    )


def _minhash_component(i: int):
    """min over shingles of xxhash64(shingle, i) — built via a closure
    factory: a `lambda s, i=i:` default-arg lambda reads as a TWO-arg
    (element, index) higher-order function to PySpark, silently hashing
    with the array POSITION instead of the permutation number, which
    makes all signature components identical and collapses LSH recall."""
    return F.array_min(F.transform("shs", lambda s: F.xxhash64(s, F.lit(i))))


def minhash_signature_col(num_hashes: int):
    return F.array(*[_minhash_component(i) for i in range(num_hashes)])


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle: int = 3,
) -> DataFrame:
    """MinHash signature per document: for permutation i, min over shingles
    of xxhash64(shingle, seed-chained i).  Entirely JVM-side (no UDF)."""
    sh = df.select(F.col(id_col).alias("doc"), _shingles(text_col, shingle).alias("shs"))
    return sh.select("doc", minhash_signature_col(num_hashes).alias("sig"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    One explode + one equi-join on (band, bucket-hash); Σ bucket² cost.
    """
    banded = signatures.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("doc").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("doc").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """MinHash LSH candidates verified with exact shingle Jaccard.

    The scale path: exact Jaccard runs ONLY on the LSH candidate pairs —
    candidates are joined back to each doc's (checkpointed) shingle set and
    intersection/union computed per candidate row with ``array_intersect``.
    The all-pairs shingle self-join never runs; total cost is one
    signature pass + Σ bucket² over LSH buckets + |candidates| set ops.
    """
    rows_per_band = num_hashes // bands
    # parallelism floor: a small-file scan collapses to 1 partition and
    # would serialize the (expensive) shingle+signature pass; at corpus
    # scale the scan is already thousands of partitions wide — no-op
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    # one shingle pass feeds both the signatures and the verify step;
    # eager localCheckpoint so the banded join and the two verify joins
    # read the materialized arrays instead of re-scanning the corpus
    sh = (
        df.select(
            F.col(id_col).alias("doc"),
            F.filter(_shingles(text_col, shingle), lambda s: F.length(s) > 0).alias(
                "shs"
            ),
        )
        .where(F.size("shs") > 0)
        .localCheckpoint(eager=True)
    )
    cands = minhash_lsh_candidates(
        sh.select("doc", minhash_signature_col(num_hashes).alias("sig")),
        bands,
        rows_per_band,
    )
    a = sh.select(F.col("doc").alias("id_a"), F.col("shs").alias("shs_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("shs").alias("shs_b"))
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    j = inter * 1.0 / (F.size("shs_a") + F.size("shs_b") - inter)
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .where(j >= threshold)
        .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over word tokens: bit b of the hash is 1 iff the sum
    of ±1 votes (sign of token-hash bit b) is positive.  Pure DataFrame:
    explode tokens → per-bit conditional sum → reassemble."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(text_col, " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << b).cast("long") if b < 63 else bit * F.lit(-(1 << 63)).cast("long")
        sig = term if sig is None else sig + term
    return votes.select("doc", sig.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via band-bucket join:
    with `bands` blocks of 64/bands bits, any pair within max_hamming <
    bands shares at least one exact block (pigeonhole)."""
    width = 64 // bands
    sigs = simhash(df, id_col, text_col)
    mask = (1 << width) - 1
    banded = sigs.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", b * width).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "block"),
    )
    a = banded.select(F.col("doc").alias("id_a"), F.col("simhash").alias("sig_a"), "band", "block")
    b = banded.select(F.col("doc").alias("id_b"), F.col("simhash").alias("sig_b"), "band", "block")
    cand = (
        a.join(b, ["band", "block"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def embedding_near_duplicates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 16,
    bands: int = 8,
    exact: bool = False,
) -> DataFrame:
    """Cosine near-dup pairs over an embedding column.

    Default (scale path): random-hyperplane LSH bucketing — candidates
    share ≥1 signature band (similarity.lsh_signatures), exact cosine runs
    on candidates only.  Recall at threshold≥0.95 is near-1 with 8 bands
    of 2 bits (near-identical vectors get near-identical sign sketches).
    ``exact=True`` keeps the O(n²) cross join for small inputs / recall
    audits.
    """
    from . import similarity

    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    if exact:
        v = v.withColumn(
            "norm",
            F.sqrt(
                F.aggregate(F.transform("e", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
            ),
        )
        a = v.select(F.col("id").alias("id_a"), F.col("e").alias("ea"), F.col("norm").alias("na"))
        b = v.select(F.col("id").alias("id_b"), F.col("e").alias("eb"), F.col("norm").alias("nb"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        sigs = similarity.lsh_signatures(v, dim=dim, bits=bits, id_col="id", vec_col="e")
        width = bits // bands
        mask = (1 << width) - 1
        banded = sigs.select(
            "id",
            "e",
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned("sig", b * width).bitwiseAND(F.lit(mask))
                        for b in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )
        a = banded.select(F.col("id").alias("id_a"), F.col("e").alias("ea"), "band", "bucket")
        b = banded.select(F.col("id").alias("id_b"), F.col("e").alias("eb"), "band", "bucket")
        pairs = (
            a.join(b, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        norm = lambda c: F.sqrt(
            F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
        )
        pairs = pairs.withColumn("na", norm("ea")).withColumn("nb", norm("eb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x)
    return (
        pairs.select(
            "id_a", "id_b", F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= threshold)
    )
