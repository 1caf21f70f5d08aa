"""IVF assignment-tier probe (verdict-r8 ask #1): time ivf_topk at
growing n_cells on /tmp/sf1.0 embeddings, Arrow tier vs HOF join tier,
plus the 10k-cell point the judge asked for."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from golang_cassandra_kafka_feed_spark.operators.similarity import ivf_topk
from golang_cassandra_kafka_feed_spark.sources.testdata import load_table

emb = load_table(spark, "/tmp/sf1.0", "embeddings")
print("corpus rows:", emb.count())
q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")

def run(tag, **kw):
    t0 = time.time()
    n = ivf_topk(emb, q, k=10, n_probe=8, **kw).count()
    print(f"{tag}: {time.time()-t0:.2f}s rows={n}", flush=True)

# steady: run each twice, report both (first includes codebook build)
for n_cells in (256, 1024, 4096, 10000):
    for rep in (1, 2):
        run(f"arrow n_cells={n_cells} rep{rep}", n_cells=n_cells,
            literal_max_cells=0, arrow_min_cells=0)
# HOF join tier reference point at 256 (the 8.1s r8 shape)
for rep in (1, 2):
    run(f"hofjoin n_cells=256 rep{rep}", n_cells=256,
        literal_max_cells=0, arrow_min_cells=1 << 20)
spark.stop()
