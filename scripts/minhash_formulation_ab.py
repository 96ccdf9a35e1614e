"""A/B: exploded groupBy minhash signatures vs explode-free array formulation.

Deterministic synthetic docs (same generator family as dedup_scale_bench).
Measures ONLY the signature stage (count() action on the signature DF).

RESULT (2026-08-19, 100k docs x ~118 shingles x 32 hashes, local[32];
recorded in BENCH.md): PARITY. Quiet-host pair: grouped 1128.4s vs
arrays 1103.7s (2.2%, inside this host's documented window noise).
Outputs verified bit-identical on a 2000-doc slice before timing. The
stage is bound by the shared xxhash64+min compute, not by the explode
or the groupBy exchange — the second formulation-level rejection after
Kirsch-Mitzenmacher (BENCH.md 2026-08-18 09:04). The grouped shape
stays the default (record-proven at 10^6 docs); the arrays shape is
kept here as the zero-exchange alternative for cluster deployments
where the one narrow signatures shuffle (~N_docs rows) matters.

Usage: python scripts/minhash_formulation_ab.py [n_docs]
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from olive_spark.pipeline.dedup import minhash_signatures, _normalized_words

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
NUM_HASHES = 32
K = 3

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.driver.memory", "48g")
    .appName("minhash_ab")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# deterministic corpus: ~120-word docs from a 5000-word vocab, some chains
docs = (
    spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    .withColumn(
        "text",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(119)),
                lambda i: F.concat(
                    F.lit("w"),
                    ((F.xxhash64(F.col("doc_id") * 1000 + i) % 5000 + 5000) % 5000).cast("string"),
                ),
            ),
        ),
    )
    .repartition(128)
    .cache()
)
docs.count()


def minhash_signatures_arrays(docs, text_col="text", num_hashes=32, shingle_k=3):
    words = _normalized_words(text_col)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - shingle_k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, shingle_k)),
        )
    )
    grams = F.filter(grams, lambda s: F.length(s) > 0)
    base = docs.select("doc_id", grams.alias("_grams")).filter(F.size("_grams") > 0)
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_grams"), lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return base.select("doc_id", sig.alias("sig"))


def run(fn, label):
    t0 = time.time()
    out = fn(docs, num_hashes=NUM_HASHES, shingle_k=K)
    n = out.count()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s rows={n}", flush=True)
    return dt


# verify identical output first at small slice
small = docs.limit(2000).cache(); small.count()
a = minhash_signatures(small, num_hashes=8, shingle_k=K).orderBy("doc_id").collect()
b = minhash_signatures_arrays(small, num_hashes=8, shingle_k=K).orderBy("doc_id").collect()
assert len(a) == len(b), (len(a), len(b))
for ra, rb in zip(a, b):
    assert ra.doc_id == rb.doc_id and ra.sig == rb.sig, (ra, rb)
print("IDENTICAL on 2000-doc slice (8 hashes)", flush=True)
small.unpersist()

# interleaved reps
for rep in range(3):
    run(minhash_signatures, f"rep{rep} grouped ")
    run(minhash_signatures_arrays, f"rep{rep} arrays  ")
spark.stop()
