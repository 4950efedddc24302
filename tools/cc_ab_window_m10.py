"""CC-only A/B over the materialized m10 edge set: window stars (HEAD)
vs groupBy+join stars (r7), same session, alternating reps."""
import sys, time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ner_backend_spark.spark.session import get_spark
from pyspark.sql import functions as F, Window

spark = get_spark("ab-cc-m10", cores="16", shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")
def force(df): df.write.format("noop").mode("overwrite").save()

from ner_backend_spark.spark import kg
from ner_backend_spark.flagship import KG_MAX_BUCKET

ENT_DIR = "/tmp/spark_graft_scaling/entities_240000_m10"
entities = spark.read.parquet(ENT_DIR)
alias_df = spark.createDataFrame(
    [("user0@example.com", "ENT_USER0"), ("a1b2c3", "ENT_TOKEN")],
    "surface string, canonical_id string",
)
mentions = kg._materialize(kg.extract_mentions(entities), eager=True)
edges, _ = kg.mention_edges(mentions, alias_df, 0.5, 15, 5, KG_MAX_BUCKET,
                            materialize_hits=False)
edges_m = kg._materialize(edges.select("src", "dst"), eager=True)
print("n_edges:", edges_m.count(), flush=True)

# r7 star forms
def _large_star_old(edges):
    sym = kg._symmetrize(edges)
    mins = sym.groupBy("src").agg(F.min("dst").alias("min_nbr"))
    m = mins.select("src", F.least(F.col("min_nbr"), F.col("src")).alias("m"))
    return (sym.join(m, "src").filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst")))

def _small_star_old(edges):
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    moved = (oriented.join(mins, "src")
             .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
    self_edges = mins.select("src", F.col("m").alias("dst"))
    return (moved.union(self_edges)
            .filter(F.col("src") != F.col("dst")).distinct())

new_pair = (kg._large_star, kg._small_star)
old_pair = (_large_star_old, _small_star_old)

import collections
walls = collections.defaultdict(list)
for rep in range(3):
    for tag, pair in [("new", new_pair), ("old", old_pair)]:
        kg._large_star, kg._small_star = pair
        t0 = time.monotonic()
        comp = kg.connected_components(edges_m)
        force(comp)
        walls[tag].append(round(time.monotonic() - t0, 2))
        print(f"rep{rep} {tag}: {walls[tag][-1]} rounds={kg.LAST_CC_ROUNDS}", flush=True)
kg._large_star, kg._small_star = new_pair
print({t: (min(w), w) for t, w in walls.items()})
spark.stop()
