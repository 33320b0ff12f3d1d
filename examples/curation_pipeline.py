"""The round-5 corpus-curation surfaces in one walkthrough — the
selection stages that run BETWEEN filtering and training:

  1. screen documents against a blocklist (C4-style bad-words stage),
  2. score word-distribution entropy (degenerate-text signal),
  3. audit corpus-wide heavy-hitter n-grams (boilerplate to curate
     into the blocklist of the next run),
  4. cluster-balanced sampling over embeddings (cap over-represented
     semantic modes, keep the long tail),
  5. deterministic train/validation/test split + domain-mixture
     reweighting (hash policies — reproducible by any engine).

Every decision here is a pure function of (document id, content):
re-running moves nothing, and a downstream loader can re-derive any
verdict without coordination — the property the DuckDB oracles
verify bit-for-bit in the registry.

Run: python examples/curation_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import get_session
from goka_spark.functions import corpus as C
from goka_spark.functions import dedup as D
from goka_spark.functions import similarity as S
from goka_spark.functions import text as T
from goka_spark.queries.base import load

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("example-curation")
spark.sparkContext.setLogLevel("ERROR")

docs = load(spark, sf, "documents")["documents"]
emb = load(spark, sf, "embeddings")["embeddings"]

# ---- 1. blocklist screening (pure scan-stage Columns) ----
screened = T.blocklist_hits(docs, "doc_id", "text",
                            ["slow", "hash", "batch"],
                            max_ratio_e6=50_000)
n_blocked = screened.filter(~F.col("keep")).count()
print(f"blocklist: {n_blocked} docs over the hit-ratio cap")

# ---- 2. entropy scoring (degenerate-text filter) ----
ent = T.word_entropy(docs, "doc_id", "text")
low = ent.filter(F.col("entropy") < 1.0).count()
print(f"entropy: {low} docs below 1.0 nat (degenerate candidates)")

# ---- 3. heavy-hitter audit (what would line_dedup remove?) ----
print("top boilerplate trigrams:")
for r in D.common_ngrams(docs, "doc_id", "text", n=3, k=5).collect():
    print(f"  df={r.df:4d}  {r.ngram!r}")

# ---- 4. cluster-balanced sampling over embeddings ----
sample = S.cluster_balanced_sample(emb, "vec_id", "embedding",
                                   per_cluster=6, bits=6)
kept = sample.filter(F.col("keep")).count()
over = sample.filter(F.col("n_cluster") > 6).count()
print(f"cluster sample: kept {kept}/{sample.count()} vectors "
      f"({over} sat in over-full clusters)")

# ---- 5. split + mixture (hash policies, zero shuffle) ----
split = C.hash_split(docs, "doc_id")
print("split sizes:", {r["split"]: r["n"] for r in
                       split.groupBy("split").agg(F.count("*").alias("n"))
                       .collect()})
mixed = C.domain_mix(docs, "doc_id", "source",
                     {f"src{i}": 20 - i for i in range(20)})
print(f"domain mix kept {mixed.count()} docs toward the target weights")

# ---- 6. the r9 audit layer: one health table per source ----
from goka_spark.queries.llmdata import (curriculum_phases,
                                        source_health_report)

print("\nsource health (encoding / PII / hapax / readability /"
      " templates):")
(source_health_report(spark, sf)
 .orderBy(F.desc("n_docs")).show(6, truncate=False))

print("curriculum phases (easy->hard token budget):")
curriculum_phases(spark, sf).orderBy("phase").show()

spark.stop()
