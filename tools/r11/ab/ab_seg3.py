import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="ab_seg3", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from iceberg_geospatial_api_server_spark.operators import text as TX
from iceberg_geospatial_api_server_spark.util import spread
from pyspark.sql import functions as F
from pyspark import StorageLevel

docs = load_table(spark, SF_DIR, "documents")
docs.limit(10).collect()
spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").collect()

def agg(ex):
    counts = ex.groupBy("__h").agg(F.countDistinct("doc_id").alias("__nd"))
    dup = F.col("__nd") >= 2
    return (ex.join(counts, "__h").groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_segs"),
             F.sum(dup.cast("int")).cast("long").alias("n_dup_segs"),
             F.round(F.sum(dup.cast("int")).cast("double")/F.count(F.lit(1)).cast("double"),6).alias("dup_seg_frac"),
             F.sum(F.when(~dup, F.col("__seg_ntok")).otherwise(F.lit(0))).cast("long").alias("n_tokens_kept")))

def v2():
    return agg(TX.segment_hashes(spread(docs, None), 10).repartition(F.col("__h")))
def v3_persist():
    ex = TX.segment_hashes(spread(docs, None), 10).persist(StorageLevel.MEMORY_AND_DISK)
    return agg(ex)
def v3_ckpt():
    ex = TX.segment_hashes(spread(docs, None), 10).localCheckpoint()
    return agg(ex)

times={"v2":[],"v3_persist":[],"v3_ckpt":[]}
for rep in range(5):
    for name,fn in [("v2",v2),("v3_persist",v3_persist),("v3_ckpt",v3_ckpt)]:
        t0=time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        times[name].append(time.perf_counter()-t0)
        spark.catalog.clearCache()
    print(f"rep {rep}: "+" ".join(f"{n}={times[n][-1]:.2f}" for n in times), flush=True)
print("MIN: "+" ".join(f"{n}={min(v):.3f}" for n,v in times.items()), flush=True)
def rows(df): return sorted(tuple(r) for r in df.collect())
assert rows(v2())==rows(v3_persist())
print("IDENTICAL", flush=True)
