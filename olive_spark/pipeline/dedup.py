"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes
------------------
- Exact: one groupBy on a 128-bit content hash — the cheapest pass,
  always run first; map-side combine makes hub texts (boilerplate
  pages, empty docs) cheap.
- MinHash+LSH: shingles -> k permutation-free min-hashes (xxhash64
  with k seeds — all JVM built-ins) -> band buckets -> self-join within
  buckets only. The band self-join is the only shuffle that grows with
  near-dup density; exact Jaccard verification runs only on candidate
  pairs.
- SimHash: 64-bit sign-sum sketch over shingle hashes via explode +
  groupBy(doc) bit aggregation — Hamming-близкие docs share most bits;
  banding on 4×16-bit chunks gives candidates.
- n-gram Jaccard: exact verification primitive (and a standalone
  brute-force dedup for small corpora / tests).

Shingling uses Spark built-ins only: lower + regexp cleanup + split +
slice/transform — no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized_words(text_col: str):
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")
    return F.split(F.trim(F.regexp_replace(norm, r"\s+", " ")), " ")


def shingles(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word k-grams per document."""
    words = _normalized_words(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
    )
    return (
        docs.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (md5, n_docs, doc_ids).

    doc_ids sorted for determinism; only groups with >1 member.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_hashes: int = 32, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, sig: array<long>) — num_hashes min-hash values.

    Permutation-free construction: h_i(s) = xxhash64(shingle, seed=i);
    sig[i] = min over shingles. One explode + one groupBy; the k hashes
    are computed as k columns in a single pass (no k-fold explode).
    """
    sh = shingles(docs, text_col, k=shingle_k)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: (doc_a, doc_b, est_jaccard).

    rows-per-band = num_hashes/bands; two docs collide if any band's
    hash-slice matches exactly. est_jaccard = fraction of matching
    minhashes (computed on the two full signatures after the bucket
    join — only for candidate pairs).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, num_hashes, shingle_k).cache()
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.select(
        F.col("band"), F.col("bucket"),
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"),
    )
    b = banded.select(
        F.col("band"), F.col("bucket"),
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"),
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()  # a pair may collide in several bands
    )
    # est_jaccard = matching signature positions / num_hashes
    match_cnt = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round(match_cnt / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
    )


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", shingle_k: int = 2
) -> DataFrame:
    """(doc_id, simhash: long) — 64-bit sign-sum sketch.

    bit_j(doc) = 1 if sum over shingles of sign(bit_j(xxhash64(s)))
    is positive. Expressed as explode + 64 conditional sums + bit
    reassembly, all built-ins.
    """
    sh = shingles(docs, text_col, k=shingle_k)
    h = F.xxhash64("shingle")
    sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = sh.groupBy("doc_id").agg(*sums)
    bit_terms = [
        F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        * F.lit(1 << i).cast("long")
        for i in range(63)  # keep sign bit clear: 63-bit sketch in a long
    ]
    sketch = bit_terms[0]
    for t in bit_terms[1:]:
        sketch = sketch + t
    return agg.select("doc_id", sketch.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over all co-shingled pairs:
    (doc_a, doc_b, jaccard >= threshold).

    |A∩B| via shingle-inverted-index self-join (only docs sharing at
    least one shingle ever meet — no full cross product), |A∪B| from
    per-doc shingle counts. Quadratic in the worst case — the exact
    verifier behind LSH, or standalone at small scale.
    """
    sh = shingles(docs, text_col, k=shingle_k).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out
