import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="prof_minhash", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from iceberg_geospatial_api_server_spark.operators import dedup as D
from pyspark.sql import functions as F

docs = load_table(spark, SF_DIR, "documents")
print("docs:", docs.count())
# warm
docs.limit(10).collect()
spark.range(0, CPUS, 1, CPUS).mapInPandas(lambda it: it, "id long").collect()

def t(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    print(f"{label:30s} {best:6.3f}s")
    return best

def noop(df):
    df.write.format("noop").mode("overwrite").save()

corpus = docs.select("doc_id", "text", F.lit(1).alias("__new"))

# stage 1: signatures
t("sig_frame", lambda: noop(D._minhash_sig_frame(corpus, "text", "doc_id", 16, 3)))

# stage 2: full pipeline
t("full_lsh", lambda: noop(D.dedup_minhash_lsh(docs, verify_threshold=0.5)))

# stage 2b: up to cand (reuse internals by persisting sig and building by hand)
from pyspark import StorageLevel
import math
def cand_only():
    sig = D._minhash_sig_frame(corpus, "text", "doc_id", 16, 3).persist(StorageLevel.MEMORY_AND_DISK)
    nbands=4; band_size=4; num_hashes=16
    bands = sig.select("doc_id","__new","__sig",
        F.explode(D._band_structs(F.col("__sig"), nbands, band_size)).alias("__b")
    ).select("doc_id","__new","__sig",F.col("__b.band").alias("band"),F.col("__b.bsig").alias("bsig"))
    buckets = (bands.groupBy("band","bsig")
        .agg(F.sort_array(F.collect_set(F.struct(F.col("doc_id").alias("id"),F.col("__sig"),F.col("__new")))).alias("members"))
        .filter((F.size("members")>=2)&(F.size("members")<=10000)))
    min_match = max(0, math.ceil(0.5*16)-1)
    pair_structs = F.flatten(F.transform(F.col("members"),
        lambda a,i: F.transform(F.slice(F.col("members"), i+2, F.size("members")),
            lambda b: F.struct(a["id"].alias("id_a"), b["id"].alias("id_b"),
                F.size(F.filter(F.zip_with(a["__sig"],b["__sig"],lambda x,y:x==y),lambda m:m)).alias("est"),
                F.greatest(a["__new"],b["__new"]).alias("keep")))))
    cand = (buckets.select(F.explode(pair_structs).alias("__p"))
        .filter((F.col("__p.est")>=F.lit(min_match))&(F.col("__p.keep")==1))
        .select("__p.id_a","__p.id_b").distinct())
    noop(cand)
t("sig+cand", cand_only)

# verify slice size
pairs = D.dedup_minhash_lsh(docs, verify_threshold=0.5)
print("pairs:", pairs.count())
spark.catalog.clearCache()
