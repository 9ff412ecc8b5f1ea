import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="ab_phash", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from iceberg_geospatial_api_server_spark.operators.multimodal import (
    image_phash, synthesize_image_corpus)
from iceberg_geospatial_api_server_spark.util import spread
from pyspark.sql import functions as F

docs = load_table(spark, SF_DIR, "documents")
docs.limit(10).collect()
spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").collect()

def hashes():
    return image_phash(synthesize_image_corpus(spread(docs, None)), stub=False)

def common(hs):
    corpus = hs.select("doc_id","phash",F.lit(1).alias("__new"))
    rows = corpus.filter(F.col("phash").isNotNull())
    blocks = rows.select("doc_id","phash","__new",
        F.explode(F.array(*[F.struct(F.lit(i).alias("blk"),
            F.pmod(F.shiftrightunsigned("phash", i*16), F.lit(1<<16)).alias("val")) for i in range(4)])).alias("__b")
        ).select("doc_id","phash","__new",F.col("__b.blk").alias("blk"),F.col("__b.val").alias("val"))
    return (blocks.groupBy("blk","val").agg(F.sort_array(F.collect_set(F.struct(
        F.col("doc_id").alias("id"),F.col("phash").alias("ph"),F.col("__new").alias("nw")))).alias("members")))

def emit_old():
    buckets = common(hashes()).filter(F.size("members")>=2)
    ps=F.flatten(F.transform(F.col("members"),lambda a,i:F.transform(F.slice(F.col("members"),i+2,F.size("members")),
        lambda b:F.struct(a["id"].alias("id_a"),b["id"].alias("id_b"),
            F.bit_count(a["ph"].bitwiseXOR(b["ph"])).cast("int").alias("hamming"),
            F.greatest(a["nw"],b["nw"]).alias("keep")))))
    return (buckets.select(F.explode(ps).alias("__p"))
        .filter((F.col("__p.hamming")<=3)&(F.col("__p.keep")==1))
        .select("__p.id_a","__p.id_b","__p.hamming").distinct().orderBy("id_a","id_b"))

def emit_new():
    buckets = common(hashes()).filter((F.size("members")>=2)&(F.size("members")<=10000))
    expanded = buckets.select("members", F.posexplode("members").alias("__i","__a"))
    tail = F.transform(F.slice(F.col("members"), F.col("__i")+2, F.size("members")),
        lambda b: F.struct(F.col("__a")["id"].alias("id_a"), b["id"].alias("id_b"),
            F.bit_count(F.col("__a")["ph"].bitwiseXOR(b["ph"])).cast("int").alias("hamming"),
            F.greatest(F.col("__a")["nw"], b["nw"]).alias("keep")))
    return (expanded.select(F.explode(tail).alias("__p"))
        .filter((F.col("__p.hamming")<=3)&(F.col("__p.keep")==1))
        .select("__p.id_a","__p.id_b","__p.hamming").distinct().orderBy("id_a","id_b"))

times={"old":[],"new":[]}
for rep in range(5):
    for name,fn in [("old",emit_old),("new",emit_new)]:
        t0=time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        times[name].append(time.perf_counter()-t0)
        spark.catalog.clearCache()
    print(f"rep {rep}: old={times['old'][-1]:.2f} new={times['new'][-1]:.2f}", flush=True)
print(f"MIN: old={min(times['old']):.3f} new={min(times['new']):.3f}", flush=True)
