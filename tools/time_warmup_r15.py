"""Time each component of bench.py's uncounted warmup block
(artifact_build_sec) separately, in the same order bench.py runs them,
so the 69 s row can be attributed per memo.  Usage:
    python tools/time_warmup_r15.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from goka_spark.queries import all_queries  # noqa: E402
from goka_spark.queries.base import load  # noqa: E402
from goka_spark.session import get_session  # noqa: E402

spark = get_session("warmup_profile")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()

rows = []


def step(name, fn):
    t0 = time.time()
    fn()
    dt = time.time() - t0
    rows.append((name, dt))
    print(f"{name:45s} {dt:7.2f}s", flush=True)


step("jvm_sum", lambda: spark.range(1_000_000)
     .selectExpr("sum(id)").collect())
step("proc_count_per_key", lambda: qs["proc_count_per_key"](spark, sf_dir)
     .write.format("noop").mode("overwrite").save())
step("arrow_pool", lambda: load(spark, sf_dir, "embeddings")["embeddings"]
     .limit(64)
     .mapInPandas(lambda it: it, "vec_id long, embedding array<float>")
     .write.format("noop").mode("overwrite").save())

from goka_spark.queries.llmdata import _ann_index  # noqa: E402

step("_ann_index build", lambda: _ann_index(
    spark, sf_dir, load(spark, sf_dir, "embeddings")["embeddings"]))
step("embedding_ivf_ann first probe", lambda: qs["embedding_ivf_ann"](
    spark, sf_dir).write.format("noop").mode("overwrite").save())

# warm_tokenizers, split out
from goka_spark.functions import bpe as B  # noqa: E402
from goka_spark.queries.llmdata import (  # noqa: E402
    _BPE_MERGES, _half_slot, _uni_pieces)

docs = load(spark, sf_dir, "documents")["documents"]


def _grouped():
    if (sf_dir, 16) not in _BPE_MERGES or \
            (sf_dir, "halves", 16) not in _BPE_MERGES:
        slot = _half_slot()
        full_m, ha, hb = B.bpe_train_grouped(
            [docs, docs.filter(slot < 50), docs.filter(slot >= 50)],
            "doc_id", "text", n_merges=16)
        _BPE_MERGES.setdefault((sf_dir, 16), full_m)
        _BPE_MERGES.setdefault((sf_dir, "halves", 16), (ha, hb))


step("tok:bpe_train_grouped(full+halves)", _grouped)


def _batched():
    key = (sf_dir, "batched", 48, 8)
    if key not in _BPE_MERGES:
        _BPE_MERGES[key] = B.bpe_train_batched(
            docs, "doc_id", "text", n_merges=48, batch=8)


step("tok:bpe_train_batched", _batched)
step("tok:_uni_pieces", lambda: _uni_pieces(docs, sf_dir))

# warm_graph_artifacts, split out
from goka_spark.queries.llmdata import (  # noqa: E402
    _edit_pairs, _gate_signals, _jaccard_cc, _keep_frame, _minhash_sigs,
    _para_keep_frame, _paragraph_sigs, _pos_dfc, _pos_postings,
    _simhash_md5, _source_grams, _winnow_kf)

step("graph:_jaccard_cc", lambda: _jaccard_cc(spark, docs, sf_dir).count())
step("graph:_keep_frame", lambda: _keep_frame(spark, sf_dir).count())
step("graph:_gate_signals", lambda: _gate_signals(spark, sf_dir).count())
step("graph:_simhash_md5", lambda: _simhash_md5(spark, docs, sf_dir).count())
step("graph:_minhash_sigs32", lambda: _minhash_sigs(
    spark, docs, sf_dir).count())
step("graph:_minhash_sigs16md5", lambda: _minhash_sigs(
    spark, docs, sf_dir, num_perm=16, base_hash="md5").count())


def _psigs():
    for _pf in _paragraph_sigs(spark, sf_dir):
        _pf.count()


step("graph:_paragraph_sigs", _psigs)
step("graph:_para_keep_frame", lambda: _para_keep_frame(
    spark, sf_dir).count())
step("graph:_winnow_kf", lambda: _winnow_kf(spark, docs, sf_dir).count())
step("graph:_edit_pairs", lambda: _edit_pairs(spark, docs, sf_dir).count())
step("graph:_source_grams", lambda: _source_grams(
    spark, docs, sf_dir).count())
step("graph:_pos_postings", lambda: _pos_postings(
    spark, docs, sf_dir).count())
step("graph:_pos_dfc", lambda: _pos_dfc(spark, docs, sf_dir).count())

total = sum(d for _, d in rows)
print(f"\n{'TOTAL':45s} {total:7.2f}s")
for name, d in sorted(rows, key=lambda r: -r[1])[:8]:
    print(f"  top: {name:40s} {d:6.2f}s ({100*d/total:4.1f}%)")
