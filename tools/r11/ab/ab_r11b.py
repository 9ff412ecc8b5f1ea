import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="ab_r11b", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from iceberg_geospatial_api_server_spark.operators import text as TX
from iceberg_geospatial_api_server_spark.operators import dedup as D
from iceberg_geospatial_api_server_spark.operators import multimodal as MM
from iceberg_geospatial_api_server_spark.util import spread
from pyspark.sql import functions as F, Window

docs = load_table(spark, SF_DIR, "documents")
docs.limit(10).collect()
spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").collect()

def _spans(df, repart, arith_base):
    n = 8
    c = F.col("text")
    grams = TX.overlapping_gram_strings(c, n)
    ex = (df.select(F.col("doc_id"), F.posexplode(grams).alias("pos","__g"))
          .select("doc_id","pos", TX.word_hash(F.col("__g")).alias("__h")))
    if repart:
        ex = ex.repartition(F.col("__h"))
    dup_hashes = (ex.groupBy("__h").agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd")>=2).select("__h"))
    dup_pos = ex.join(dup_hashes,"__h").select("doc_id","pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos")-F.lag("pos").over(w) > F.lit(n), F.lit(1)).otherwise(F.lit(0))
    spans = (dup_pos.withColumn("__isl", F.sum(brk).over(w))
        .groupBy("doc_id","__isl")
        .agg(F.count(F.lit(1)).alias("__grams"), (F.max("pos")-F.min("pos")+n).alias("__span_tokens"))
        .groupBy("doc_id")
        .agg(F.sum("__grams").cast("long").alias("n_dup_grams"),
             F.count(F.lit(1)).cast("long").alias("n_spans"),
             F.sum("__span_tokens").cast("long").alias("dup_tokens")))
    if arith_base:
        ntok = TX.token_count(c).cast("long")
        base = df.select(F.col("doc_id"), ntok.alias("n_tokens"),
                         F.greatest(ntok - F.lit(n-1), F.lit(0)).cast("long").alias("n_grams"))
    else:
        base = df.select(F.col("doc_id"), TX.token_count(c).cast("long").alias("n_tokens"),
                         F.size(grams).cast("long").alias("n_grams"))
    return (base.join(spans, "doc_id", "left")
        .select("doc_id","n_tokens","n_grams",
            F.coalesce("n_dup_grams",F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("n_spans",F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens",F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(F.coalesce("dup_tokens",F.lit(0)).cast("double")/F.col("n_tokens").cast("double"),6).alias("dup_token_frac")))

def spans_cur(): return TX.dup_span_stats(spread(docs, None))
def spans_arith(): return _spans(spread(docs, None), False, True)

def decon_cur():
    d = spread(docs, None); bench = d.filter(F.col("doc_id")%97==0)
    return (TX.decontaminate(d, bench, portable_hash=True)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n_clean")).orderBy("lang"))
def decon_split():
    d = spread(docs, None); bench = d.filter(F.col("doc_id")%97==0)
    def gram_strings_split(col, n=3):
        toks = F.split(col, " ")
        m = F.greatest(F.size(toks)-(n-1), F.lit(0))
        acc = F.slice(toks, 1, m)
        for j in range(1, n):
            acc = F.zip_with(acc, F.slice(toks, j+1, m), lambda x,y: F.concat_ws(" ", x, y))
        return acc
    def gram_rows(df, *keep):
        out = df.select(*keep, F.explode(gram_strings_split(F.col("text"))).alias("__gs"))
        return out.select(*keep, D.word_hash(F.col("__gs")).alias("__g"))
    bg = gram_rows(bench).distinct()
    dg = gram_rows(d, "doc_id")
    cont = dg.join(F.broadcast(bg), on="__g").select("doc_id").distinct()
    return (d.join(cont, on="doc_id", how="left_anti")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n_clean")).orderBy("lang"))

# phash emission A/B on the real media pipeline (hashes persisted so we
# time only the pair emission difference... actually time end to end like bench)
import __spark_entry__ as E
qs = E.queries()
def phash_entry(): return qs["mm_phash_pairs"](spark, SF_DIR)

# old flattened emission, reconstructed for A/B
def phash_old():
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        image_phash, synthesize_image_corpus)
    docs_m = load_table(spark, SF_DIR, "documents")
    media = synthesize_image_corpus(docs_m)
    hashes = image_phash(media, stub=False)
    corpus = hashes.select("doc_id","phash",F.lit(1).alias("__new"))
    rows = corpus.filter(F.col("phash").isNotNull())
    blocks = rows.select("doc_id","phash","__new",
        F.explode(F.array(*[F.struct(F.lit(i).alias("blk"),
            F.pmod(F.shiftrightunsigned("phash", i*16), F.lit(1<<16)).alias("val")) for i in range(4)])).alias("__b")
        ).select("doc_id","phash","__new",F.col("__b.blk").alias("blk"),F.col("__b.val").alias("val"))
    buckets=(blocks.groupBy("blk","val").agg(F.sort_array(F.collect_set(F.struct(
        F.col("doc_id").alias("id"),F.col("phash").alias("ph"),F.col("__new").alias("nw")))).alias("members"))
        .filter(F.size("members")>=2))
    ps=F.flatten(F.transform(F.col("members"),lambda a,i:F.transform(F.slice(F.col("members"),i+2,F.size("members")),
        lambda b:F.struct(a["id"].alias("id_a"),b["id"].alias("id_b"),
            F.bit_count(a["ph"].bitwiseXOR(b["ph"])).cast("int").alias("hamming"),
            F.greatest(a["nw"],b["nw"]).alias("keep")))))
    return (buckets.select(F.explode(ps).alias("__p"))
        .filter((F.col("__p.hamming")<=3)&(F.col("__p.keep")==1))
        .select("__p.id_a","__p.id_b","__p.hamming").distinct())

VARIANTS=[("spans_cur",spans_cur),("spans_arith",spans_arith),
          ("decon_cur",decon_cur),("decon_split",decon_split),
          ("phash_new",phash_entry),("phash_old",phash_old)]
times={n:[] for n,_ in VARIANTS}
for rep in range(5):
    for name,fn in VARIANTS:
        t0=time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        times[name].append(time.perf_counter()-t0)
        spark.catalog.clearCache()
    print(f"rep {rep}: "+" ".join(f"{n}={times[n][-1]:.2f}" for n,_ in VARIANTS), flush=True)
print("MIN: "+" ".join(f"{n}={min(v):.3f}" for n,v in times.items()), flush=True)
def rows(df): return sorted(tuple(r) for r in df.collect())
assert rows(spans_cur())==rows(spans_arith()), "spans mismatch"
spark.catalog.clearCache()
assert rows(phash_entry())==rows(phash_old()), "phash mismatch"
print("RESULTS IDENTICAL", flush=True)
