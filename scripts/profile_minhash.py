"""Stage-by-stage profile of minhash_near_dup at sf0.1."""
import time, sys
sys.path.insert(0, "/root/repo")
from varpulis_spark.engine import get_spark, load_table
from varpulis_spark.operators import dedup as D
from pyspark.sql import functions as F

spark = get_spark("profile-minhash", cores=32)
sf = "/root/testdata/sf0.1"
docs = load_table(spark, sf, "documents")
docs.count()  # warm the scan

def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label}: {time.time()-t0:.2f}s -> {r}")
    return r

# stage 1: signature UDF only
sig = D.minhash_signature_udf(128, 5)
base = D.spread(docs.select(F.col("doc_id").alias("id"), F.col("text").alias("__t"))).select(
    "id", sig(F.col("__t")).alias("sig"))
t("sig_udf (count)", lambda: base.count())

base_p = base.persist()
t("persist+count", lambda: base_p.count())

rows_per_band = 128 // 32
banded = base_p.select(
    "id",
    F.explode(F.array(*[
        F.xxhash64(F.lit(j), *[F.col("sig").getItem(j * rows_per_band + r) for r in range(rows_per_band)])
        for j in range(32)
    ])).alias("bucket"))
t("banding (count)", lambda: banded.count())

pairs = D._bucket_pairs(banded)
t("bucket_pairs (count)", lambda: pairs.count())

a_sig = base_p.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
b_sig = base_p.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)).cast("double") / F.lit(128.0)
ver = (pairs.join(a_sig, "id_a").join(b_sig, "id_b")
       .withColumn("est_jaccard", est).filter(F.col("est_jaccard") >= 0.4)
       .select("id_a", "id_b", "est_jaccard"))
t("verify join (count)", lambda: ver.count())

base_p.unpersist()
# full query fresh
t("FULL fresh", lambda: D.minhash_near_dup_pairs(docs, threshold=0.4).count())
t("FULL fresh 2", lambda: D.minhash_near_dup_pairs(docs, threshold=0.4).count())
