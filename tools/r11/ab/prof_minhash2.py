import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
CPUS = 32
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="prof_minhash2", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from iceberg_geospatial_api_server_spark.operators import dedup as D
from pyspark.sql import functions as F

docs = load_table(spark, SF_DIR, "documents")
docs.limit(10).collect()
spark.range(0, CPUS, 1, CPUS).mapInPandas(lambda it: it, "id long").collect()
sc = spark.sparkContext

def t(label, builder, reps=3):
    best = None; jobs = None
    for r in range(reps):
        t0 = time.perf_counter()
        df = builder()
        n0 = len(sc.statusTracker().getJobIdsForGroup(None) or []) if False else None
        sc.setJobGroup(f"g{label}{r}", label)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"g{label}{r}"))
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    print(f"{label:32s} {best:6.3f}s  jobs/rep={jobs}", flush=True)

# full pipeline as-is
t("full_lsh", lambda: D.dedup_minhash_lsh(docs, verify_threshold=0.5))
# cache-free variant
t("full_lsh_nocache", lambda: D.dedup_minhash_lsh(docs, verify_threshold=0.5, storage_level=None))

# manual: build and TIME stage by stage within one run
import math
from pyspark import StorageLevel
def staged():
    corpus = docs.select("doc_id","text",F.lit(1).alias("__new"))
    t0=time.perf_counter()
    sig = D._minhash_sig_frame(corpus, "text", "doc_id", 16, 3).persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    t1=time.perf_counter()
    bands = sig.select("doc_id","__new","__sig", F.explode(D._band_structs(F.col("__sig"),4,4)).alias("__b")
        ).select("doc_id","__new","__sig",F.col("__b.band").alias("band"),F.col("__b.bsig").alias("bsig"))
    buckets=(bands.groupBy("band","bsig").agg(F.sort_array(F.collect_set(F.struct(F.col("doc_id").alias("id"),F.col("__sig"),F.col("__new")))).alias("members"))
        .filter((F.size("members")>=2)&(F.size("members")<=10000)))
    ps = F.flatten(F.transform(F.col("members"), lambda a,i: F.transform(F.slice(F.col("members"), i+2, F.size("members")),
        lambda b: F.struct(a["id"].alias("id_a"), b["id"].alias("id_b"),
            F.size(F.filter(F.zip_with(a["__sig"],b["__sig"],lambda x,y:x==y),lambda m:m)).alias("est"),
            F.greatest(a["__new"],b["__new"]).alias("keep")))))
    cand=(buckets.select(F.explode(ps).alias("__p")).filter((F.col("__p.est")>=7)&(F.col("__p.keep")==1))
        .select("__p.id_a","__p.id_b").distinct().persist(StorageLevel.MEMORY_AND_DISK))
    cand.count()
    t2=time.perf_counter()
    cand_ids = cand.select(F.explode(F.array("id_a","id_b")).alias("doc_id")).distinct()
    needed = corpus.join(cand_ids, on="doc_id", how="leftsemi").select(
        F.col("doc_id"), F.col("__new"),
        D._shingle_expr("text",3).alias("__sh")).filter(F.size("__sh")>0).persist(StorageLevel.MEMORY_AND_DISK)
    needed.count()
    t3=time.perf_counter()
    ga = needed.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__ga"))
    gb = needed.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__gb"))
    verified = cand.join(ga,"id_a").join(gb,"id_b")
    inter = F.size(F.array_intersect("__ga","__gb")).cast("double")
    union = (F.size("__ga")+F.size("__gb")-inter).cast("double")
    jac = F.when(union>0, inter/union).otherwise(F.lit(0.0))
    out = verified.withColumn("jaccard",jac).filter(F.col("jaccard")>=0.5).select("id_a","id_b",F.round("jaccard",6).alias("jaccard"))
    out.write.format("noop").mode("overwrite").save()
    t4=time.perf_counter()
    print(f"  sig={t1-t0:.3f} cand={t2-t1:.3f} needed={t3-t2:.3f} verify+final={t4-t3:.3f} total={t4-t0:.3f}", flush=True)
    spark.catalog.clearCache()
for _ in range(3):
    staged()
