import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="prof_simhash2", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from pyspark.sql import functions as F
docs = load_table(spark, SF_DIR, "documents")
docs.limit(10).collect()
def t(label, df, reps=3):
    best=None
    for _ in range(reps):
        t0=time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
        spark.catalog.clearCache()
    print(f"{label:34s} {best:6.3f}s", flush=True)

corpus = docs.select("doc_id","text",F.lit(1).alias("__new"))
exploded_raw = (corpus.repartition(F.col("doc_id"))
    .withColumn("__rk", F.monotonically_increasing_id())
    .select("doc_id","__new","__rk", F.explode(F.split(F.col("text")," ")).alias("__w")))
t("explode_only", exploded_raw.select(F.count(F.lit(1)).alias("n")))
dedup = exploded_raw.groupBy("doc_id","__rk","__w").agg(F.first("__new").alias("__new"))
t("explode+dedup_agg", dedup.select(F.count(F.lit(1)).alias("n")))
hashed = dedup.select("doc_id","__new", F.pmod(F.xxhash64("__w"), F.lit(2147483647)).alias("__h"))
# votes (copy of the packed agg)
field=31; mask=(1<<field)-1; bits=32
groups=[list(range(i,min(i+2,bits))) for i in range(0,bits,2)]
aggs=[F.count(F.lit(1)).alias("__n"), F.first("__new").alias("__new")]
for gi,g in enumerate(groups):
    packed=None
    for j,b in enumerate(g):
        tt=F.shiftleft(F.shiftright(F.col("__h"),b).bitwiseAND(F.lit(1)), j*field)
        packed=tt if packed is None else packed+tt
    aggs.append(F.sum(packed.cast("long")).alias(f"__p{gi}"))
fp=None
for gi,g in enumerate(groups):
    for j,b in enumerate(g):
        ones=F.shiftright(F.col(f"__p{gi}"),j*field).bitwiseAND(F.lit(mask))
        part=F.when(ones*2>F.col("__n"),F.lit(1<<b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp=part if fp is None else fp+part
full=hashed.groupBy("doc_id").agg(*aggs).select("doc_id","__new",fp.alias("simhash"))
t("full_fingerprints", full)
# variant: dedup on 64-bit xxhash instead of word string (default path)
h64 = exploded_raw.select("doc_id","__new","__rk", F.xxhash64("__w").alias("__h64"))
dedup2 = h64.groupBy("doc_id","__rk","__h64").agg(F.first("__new").alias("__new"))
hashed2 = dedup2.select("doc_id","__new", F.pmod(F.col("__h64"), F.lit(2147483647)).alias("__h"))
full2=hashed2.groupBy("doc_id").agg(*aggs).select("doc_id","__new",fp.alias("simhash"))
t("variant_hash_keyed_dedup", full2)
# equality check
a = {r[0]: r[2] for r in full.collect()}
b = {r[0]: r[2] for r in full2.collect()}
print("fingerprints identical:", a == b, flush=True)
