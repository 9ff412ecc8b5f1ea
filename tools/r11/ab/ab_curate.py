import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="ab_curate", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from iceberg_geospatial_api_server_spark.operators import text as TX
from iceberg_geospatial_api_server_spark.util import spread
from pyspark.sql import functions as F, Window

docs = load_table(spark, SF_DIR, "documents")
docs.limit(10).collect()
spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").collect()

def cur():
    return TX.curate_corpus(spread(docs, None))

def v2():
    d = spread(docs, None).select("*", F.monotonically_increasing_id().alias("__rk"))
    c = F.col("text")
    filtered = d.filter(
        TX.curation_keep_predicate(c) & F.col("__rk").isNotNull()
    ).drop("__rk")
    w = Window.partitionBy(F.md5(c)).orderBy("doc_id")
    kept = (filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("lang"), TX.token_count(c).cast("long").alias("__nt"),
                F.round(TX.quality_score(c) * 1e6).cast("long").alias("__q6")))
    return (kept.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("__nt").cast("long").alias("total_tokens"),
             F.round(F.sum("__q6").cast("double")/F.count(F.lit(1)).cast("double")/1e6,6).alias("mean_quality"))
        .orderBy("lang"))

def v3():  # no spread at all (gates in the scan task, no useless text exchange)
    return TX.curate_corpus(docs)

times={"cur":[],"v2":[],"v3":[]}
for rep in range(5):
    for name,fn in [("cur",cur),("v2",v2),("v3",v3)]:
        t0=time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        times[name].append(time.perf_counter()-t0)
        spark.catalog.clearCache()
    print(f"rep {rep}: "+" ".join(f"{n}={times[n][-1]:.2f}" for n in times), flush=True)
print("MIN: "+" ".join(f"{n}={min(v):.3f}" for n,v in times.items()), flush=True)
def rows(df): return [tuple(r) for r in df.collect()]
assert rows(cur())==rows(v2())==rows(v3())
print("IDENTICAL", flush=True)
# confirm v2 plan keeps the gates above the exchange
from iceberg_geospatial_api_server_spark.plans.explain import formatted_plan
p = formatted_plan(v2())
import re
scan_i = p.find("Scan parquet")
print("filter below exchange in v2:", "regexp_extract_all" in p[:p.find("RoundRobinPartitioning")], flush=True)
