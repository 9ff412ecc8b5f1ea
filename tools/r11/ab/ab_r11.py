import os, sys, time, math
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
from iceberg_geospatial_api_server_spark.session import get_spark
spark = get_spark(app_name="ab_r11", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from iceberg_geospatial_api_server_spark.sources.tables import load_table
from iceberg_geospatial_api_server_spark.operators import dedup as D
from iceberg_geospatial_api_server_spark.operators import text as TX
from iceberg_geospatial_api_server_spark.util import spread
from pyspark.sql import functions as F, Window
from pyspark import StorageLevel

docs = load_table(spark, SF_DIR, "documents")
docs.limit(10).collect()
spark.range(0, 32, 1, 32).mapInPandas(lambda it: it, "id long").collect()
SL = StorageLevel.MEMORY_AND_DISK

def minhash_current():
    return D.dedup_minhash_lsh(docs, verify_threshold=0.5)

def minhash_v2():  # cand_ids without distinct
    corpus = docs.select("doc_id","text",F.lit(1).alias("__new"))
    sig = D._minhash_sig_frame(corpus,"text","doc_id",16,3).persist(SL)
    bands = sig.select("doc_id","__new","__sig",F.explode(D._band_structs(F.col("__sig"),4,4)).alias("__b")
        ).select("doc_id","__new","__sig",F.col("__b.band").alias("band"),F.col("__b.bsig").alias("bsig"))
    buckets=(bands.groupBy("band","bsig").agg(F.sort_array(F.collect_set(F.struct(F.col("doc_id").alias("id"),F.col("__sig"),F.col("__new")))).alias("members"))
        .filter((F.size("members")>=2)&(F.size("members")<=10000)))
    ps=F.flatten(F.transform(F.col("members"),lambda a,i:F.transform(F.slice(F.col("members"),i+2,F.size("members")),
        lambda b:F.struct(a["id"].alias("id_a"),b["id"].alias("id_b"),
            F.size(F.filter(F.zip_with(a["__sig"],b["__sig"],lambda x,y:x==y),lambda m:m)).alias("est"),
            F.greatest(a["__new"],b["__new"]).alias("keep")))))
    cand=(buckets.select(F.explode(ps).alias("__p")).filter((F.col("__p.est")>=7)&(F.col("__p.keep")==1))
        .select("__p.id_a","__p.id_b").distinct().persist(SL))
    cand_ids = cand.select(F.explode(F.array("id_a","id_b")).alias("doc_id"))
    needed = (corpus.join(cand_ids, on="doc_id", how="leftsemi")
        .select("doc_id","__new",D._shingle_expr("text",3).alias("__sh")).filter(F.size("__sh")>0).persist(SL))
    ga=needed.select(F.col("doc_id").alias("id_a"),F.col("__sh").alias("__ga"))
    gb=needed.select(F.col("doc_id").alias("id_b"),F.col("__sh").alias("__gb"))
    verified=cand.join(ga,"id_a").join(gb,"id_b")
    inter=F.size(F.array_intersect("__ga","__gb")).cast("double")
    union=(F.size("__ga")+F.size("__gb")-inter).cast("double")
    jac=F.when(union>0,inter/union).otherwise(F.lit(0.0))
    return verified.withColumn("jaccard",jac).filter(F.col("jaccard")>=0.5).select("id_a","id_b",F.round("jaccard",6).alias("jaccard"))

def seg_current():
    return TX.segment_dedup_stats(spread(docs, None))

def seg_v2():
    ex = TX.segment_hashes(spread(docs, None), 10).repartition(F.col("__h"))
    counts = ex.groupBy("__h").agg(F.countDistinct("doc_id").alias("__nd"))
    dup = F.col("__nd") >= 2
    return (ex.join(counts, "__h").groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_segs"),
             F.sum(dup.cast("int")).cast("long").alias("n_dup_segs"),
             F.round(F.sum(dup.cast("int")).cast("double")/F.count(F.lit(1)).cast("double"),6).alias("dup_seg_frac"),
             F.sum(F.when(~dup, F.col("__seg_ntok")).otherwise(F.lit(0))).cast("long").alias("n_tokens_kept")))

def spans_current():
    return TX.dup_span_stats(spread(docs, None))

def _spans_v2(df, repart, arith_base):
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
                         F.greatest(ntok - F.lit(n - 1), F.lit(0)).cast("long").alias("n_grams"))
    else:
        base = df.select(F.col("doc_id"), TX.token_count(c).cast("long").alias("n_tokens"),
                         F.size(grams).cast("long").alias("n_grams"))
    return (base.join(spans, "doc_id", "left")
        .select("doc_id","n_tokens","n_grams",
            F.coalesce("n_dup_grams",F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("n_spans",F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens",F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(F.coalesce("dup_tokens",F.lit(0)).cast("double")/F.col("n_tokens").cast("double"),6).alias("dup_token_frac")))

def spans_v2(): return _spans_v2(spread(docs, None), True, True)

def decon_current():
    d = spread(docs, None)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return (TX.decontaminate(d, bench, portable_hash=True)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n_clean")).orderBy("lang"))

def decon_split():
    # F.split-based gram build (rolling zip_with concat) instead of regex
    d = spread(docs, None)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    def gram_strings_split(col, n=3):
        toks = F.split(col, " ")
        m = F.greatest(F.size(toks) - (n-1), F.lit(0))
        acc = F.slice(toks, 1, m)
        for j in range(1, n):
            acc = F.zip_with(acc, F.slice(toks, j+1, m), lambda x, y: F.concat_ws(" ", x, y))
        return acc
    def gram_rows(df, *keep):
        out = df.select(*keep, F.explode(gram_strings_split(F.col("text"))).alias("__gs"))
        return out.select(*keep, D.word_hash(F.col("__gs")).alias("__g"))
    bench_grams = gram_rows(bench).distinct()
    doc_grams = gram_rows(d, "doc_id")
    contaminated = doc_grams.join(F.broadcast(bench_grams), on="__g").select("doc_id").distinct()
    out = d.join(contaminated, on="doc_id", how="left_anti")
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_clean")).orderBy("lang")

def simhash_current():
    return D.dedup_simhash(docs)

def simhash_bucket():
    corpus = docs.select("doc_id","text",F.lit(1).alias("__new"))
    sigs = D._simhash_fingerprints(corpus,"text","doc_id",32,False).persist(SL)
    nblocks=4; mask=255
    blocks = sigs.select("doc_id","__new","simhash",
        F.explode(F.array(*[F.struct(F.lit(i).alias("blk"),
            (F.shiftright("simhash", i*8) % F.lit(256)).alias("val")) for i in range(4)])).alias("__b")
        ).select("doc_id","__new","simhash",F.col("__b.blk").alias("blk"),F.col("__b.val").alias("val"))
    buckets=(blocks.groupBy("blk","val").agg(F.sort_array(F.collect_set(F.struct(
        F.col("doc_id").alias("id"),F.col("simhash").alias("sh"),F.col("__new").alias("nw")))).alias("members"))
        .filter(F.size("members")>=2))
    expanded = buckets.select("members", F.posexplode("members").alias("__i","__a"))
    tail = F.transform(F.slice(F.col("members"), F.col("__i")+2, F.size("members")),
        lambda b: F.struct(F.col("__a")["id"].alias("id_a"), b["id"].alias("id_b"),
            F.bit_count(F.col("__a")["sh"].bitwiseXOR(b["sh"])).cast("int").alias("hamming"),
            F.greatest(F.col("__a")["nw"], b["nw"]).alias("keep")))
    return (expanded.select(F.explode(tail).alias("__p"))
        .filter((F.col("__p.hamming")<=2)&(F.col("__p.keep")==1))
        .select("__p.id_a","__p.id_b","__p.hamming").distinct())

VARIANTS = [
    ("minhash_cur", minhash_current), ("minhash_v2", minhash_v2),
    ("seg_cur", seg_current), ("seg_v2", seg_v2),
    ("spans_cur", spans_current), ("spans_v2", spans_v2),
    ("decon_cur", decon_current), ("decon_split", decon_split),
    ("simhash_cur", simhash_current), ("simhash_bucket", simhash_bucket),
]
times = {n: [] for n, _ in VARIANTS}
for rep in range(4):
    for name, fn in VARIANTS:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        times[name].append(dt)
        spark.catalog.clearCache()
    print(f"rep {rep}: " + " ".join(f"{n}={times[n][-1]:.2f}" for n, _ in VARIANTS), flush=True)
print("\nMIN: " + " ".join(f"{n}={min(v):.3f}" for n, v in times.items()))

# equality checks
def rows(df): return sorted(tuple(r) for r in df.collect())
assert rows(minhash_current()) == rows(minhash_v2()), "minhash mismatch"
spark.catalog.clearCache()
assert rows(seg_current()) == rows(seg_v2()), "seg mismatch"
spark.catalog.clearCache()
assert rows(spans_current()) == rows(spans_v2()), "spans mismatch"
spark.catalog.clearCache()
assert rows(decon_current()) == rows(decon_split()), "decon mismatch"
spark.catalog.clearCache()
assert rows(simhash_current()) == rows(simhash_bucket()), "simhash mismatch"
print("ALL VARIANTS RESULT-IDENTICAL", flush=True)
