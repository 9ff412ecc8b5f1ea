import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
CPUS = 32
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="prof_simhash", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from iceberg_geospatial_api_server_spark.operators import dedup as D
from pyspark.sql import functions as F
from pyspark import StorageLevel

docs = load_table(spark, SF_DIR, "documents")
docs.limit(10).collect()
spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").collect()

def staged():
    corpus = docs.select("doc_id","text",F.lit(1).alias("__new"))
    t0=time.perf_counter()
    sigs = D._simhash_fingerprints(corpus, "text", "doc_id", 32, False).persist(StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    t1=time.perf_counter()
    out = D._simhash_block_pairs(sigs, "doc_id", 32, 8, 2)
    out.write.format("noop").mode("overwrite").save()
    t2=time.perf_counter()
    print(f"  fingerprints={t1-t0:.3f} blockpairs={t2-t1:.3f} total={t2-t0:.3f}", flush=True)
    spark.catalog.clearCache()
for _ in range(3):
    staged()

# also: the full operator and portable variant (the oracled one)
def t(label, builder, reps=3):
    best=None
    for _ in range(reps):
        t0=time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
        spark.catalog.clearCache()
    print(f"{label:28s} {best:6.3f}s", flush=True)
t("dedup_simhash_full", lambda: D.dedup_simhash(docs))
