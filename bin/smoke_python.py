"""Python-surface smoke test: run via bin/pyspark or spark-submit.

    bin/pyspark < /dev/null  # interactive
    /opt/spark/bin/spark-submit --jars <graft jar> bin/smoke_python.py

Proves the two install paths (extension conf + Py4J hook) and that sketch
SQL executes JVM-side from Python.
"""
from pyspark.sql import SparkSession

spark = (SparkSession.builder
         .master("local[2]")
         .appName("graft-python-smoke")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())

# Py4J hook (idempotent even when the extension already registered everything)
spark._jvm.org.apache.spark.api.python.GraftPythonApi.install(spark._jsparkSession)

df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
agg = (df.selectExpr(
    "approx_percentile_ex(l_quantity, 0.5) AS p50",
    "approx_count_distinct_ex(l_orderkey) AS nd")
    .collect()[0])
assert agg.p50 is not None and agg.nd > 0, agg
scalar = (df.selectExpr("size(graft_minhash(split(lower(l_returnflag), ' '), 16)) AS mh")
          .collect()[0])
assert scalar.mh == 16, scalar

# Pipeline operators from Python: plan handles cross Py4J, execution
# stays JVM-side (no Python UDF boundary anywhere).
from pyspark.sql import DataFrame

api = spark._jvm.org.apache.spark.api.python.GraftPythonApi
sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
prof = DataFrame(api.profile(sup._jdf), spark)
rows = {r.col_name: r for r in prof.collect()}
assert rows["s_suppkey"].n_nulls == 0 and rows["s_suppkey"].n_distinct == sup.count(), rows

orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
js = DataFrame(api.keyOverlap(orders._jdf, "o_custkey", cust._jdf, "c_custkey"), spark).collect()[0]
assert js.n_overlap > 0 and js.est_join_rows > 0, js

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
dd = DataFrame(api.exactDedup(docs._jdf, "doc_id", "text"), spark)
assert dd.count() > 0

# classifier training counts + byte-balanced sharding + token budget
from pyspark.sql import functions as F
labeled = docs.withColumn("is_en", F.col("lang") == "en")
trained = DataFrame(api.trainHashedBow(labeled._jdf, "is_en", "text", 32, 1.0), spark)
assert trained.count() > 0 and trained.agg(F.sum("n_pos")).collect()[0][0] > 0
shards = DataFrame(api.sizeShards(docs._jdf, "doc_id", "n_chars", 5000, 16), spark)
assert shards.groupBy("shard").count().count() > 1
scored = docs.selectExpr(
    "doc_id", "graft_hashed_bow_score(text, array(1.0d, -2.0d, 3.0d)) AS score",
    "n_chars AS n_tokens")
sel = DataFrame(api.selectByTokenBudget(scored._jdf, "doc_id", "score", "n_tokens", 20000), spark)
assert 0 < sel.count() < docs.count()

# line filtering + BM25 retrieval
fl = DataFrame(api.filterLines(docs._jdf, "doc_id", "text", 3, False, ["click here"]), spark)
assert fl.count() == docs.count() and fl.agg(F.sum("n_kept")).collect()[0][0] > 0
hits = DataFrame(api.bm25TopK(docs._jdf, "doc_id", "text",
                              [[1, "hash join"], [2, "slow scan"]], 5), spark)
assert hits.count() == 10 and hits.agg(F.min("score_fp")).collect()[0][0] > 0

# corpus diff + vocab + span mining/rewrite
newer = docs.withColumn("text", F.when(F.col("doc_id") % 9 == 0,
                                       F.concat(F.col("text"), F.lit(" upd")))
                        .otherwise(F.col("text")))
cd = DataFrame(api.corpusDiff(docs._jdf, newer._jdf, "doc_id", "text"), spark)
assert cd.where("status = 'changed'").count() > 0
vocab = DataFrame(api.buildVocab(docs._jdf, "text", 10), spark)
assert vocab.count() == 10 and vocab.orderBy("rank").collect()[-1]["cov_ppm"] <= 1000000
spans = DataFrame(api.repeatedSpans(docs._jdf, "doc_id", "text", 8, 3, 1000), spark)
rw = DataFrame(api.dedupSpansRewrite(docs._jdf, "doc_id", "text", 8, 3, 1000), spark)
assert rw.count() == docs.count()
assert rw.agg(F.sum("n_dropped")).collect()[0][0] >= 0

# persisted text index + forward as-of
import tempfile
tidx = tempfile.mkdtemp(prefix="graft_smoke_tidx")
api.textIndexBuild(docs._jdf, "doc_id", "text", tidx, 8)
ih = DataFrame(api.textIndexQuery(spark._jsparkSession, tidx,
                                  [[1, "hash join"]], 5, 8), spark)
assert ih.count() == 5
# events.ts is parquet timestamp[us] (TIMESTAMP_NTZ) since r6 — micros as
# the asof key; NTZ->LTZ cast is exact under the UTC session timezone
ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
    .selectExpr("event_id", "user_id",
                "unix_micros(CAST(ts AS TIMESTAMP)) AS t")
fwd = DataFrame(api.asofForward(ev.limit(200)._jdf, ev._jdf, "user_id", "t"), spark)
assert fwd.count() == 200

# html strip + temperature sampling + NFC normalization via SQL
sh = DataFrame(api.stripHtml(docs._jdf, "doc_id", "text"), spark)
assert sh.count() == docs.count()
ts = DataFrame(api.temperatureSample(docs._jdf, "doc_id", "lang", 0.5), spark)
assert 0 < ts.count() <= docs.count()
nfc = docs.selectExpr("graft_normalize_unicode(text, 'NFC') AS t").count()
assert nfc == docs.count()

rep = DataFrame(api.textProfile(docs._jdf, "doc_id", "text"), spark)
assert rep.count() == 1 and rep.collect()[0]["n_docs"] == docs.count()

# matrix sketches + deterministic k-means over embeddings
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
fdrow = emb.selectExpr("CAST(embedding AS ARRAY<DOUBLE>) v") \
    .selectExpr("vec_gram_agg(v) g", "fd_accumulate(v, 8) s") \
    .selectExpr("size(g) d2", "fd_error_bound(s) eps",
                "fd_singular_values(s)[0] sv0").collect()[0]
assert fdrow["d2"] == 64 * 64 and fdrow["eps"] > 0 and fdrow["sv0"] > 0
km = DataFrame(api.kmeansAssign(emb._jdf, "vec_id", "embedding", 4, 2), spark)
assert km.count() == emb.count()
assert km.select("cluster").distinct().count() <= 4
cov = DataFrame(api.covarianceN2(emb._jdf, "embedding"), spark)
assert cov.count() == 64 * 65 // 2
pca = DataFrame(api.pcaProject(emb._jdf, "vec_id", "embedding", 4), spark)
assert pca.agg(F.min("residual_sq")).collect()[0][0] >= -1e-9

print("PYTHON-SMOKE OK", agg, scalar, js)
spark.stop()
