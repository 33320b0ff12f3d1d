"""The r12 sub-document curation surfaces in one walkthrough — the
CCNet-style paragraph layer (Wenzek et al. 2020) plus the winnowing
cross-split leak detector:

  1. profile paragraph-level duplication per document (which docs are
     mostly boilerplate),
  2. see WHERE duplicated paragraphs live (head/middle/tail — edge
     bias means trim-by-position pays before any hashing),
  3. run the prune transform (exactly one copy of every duplicated
     paragraph survives corpus-wide; the rebuilt corpus is
     md5-fingerprinted so the whole transform is verifiable),
  4. read the per-source savings report (who was paying the
     boilerplate tax),
  5. check the train/eval boundary for SUBSTRING leaks with the MOSS
     winnowing guarantee (any shared ≥6-word run yields an identical
     fingerprint — reference-free, no benchmark list needed),

and (r13) the NEAR-dup paragraph layer exact hashing misses:

  6. classify duplicated paragraphs as positional TEMPLATES (nav
     chrome, footers) vs position-free re-quotes,
  7. mine near-dup paragraph pairs at sketch cost (16-perm MinHash
     over distinct normalized paragraphs, banded 4x4) and turn them
     into the production KEEP verdict (connected components, keep
     the most-instanced variant),
  8. measure the EXACT longest shared word-run per near-dup doc pair
     (the min-span threshold a span-remover needs), and audit shared
     document PREFIXES at 8/16/32 words (mirrored heads whole-doc
     dedup misses).

Every verdict is a pure function of (doc_id, content): re-running
moves nothing, and the registry's DuckDB oracles verify each stage
bit-for-bit.

Run: python examples/paragraph_dedup.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from goka_spark import get_session
from goka_spark.queries.llmdata import (
    ccnet_paragraph_dedup,
    doc_prefix_dup_partners,
    longest_shared_run_pairs,
    paragraph_dedup_savings,
    paragraph_minhash_keep,
    paragraph_minhash_pairs,
    paragraph_position_bias,
    paragraph_prune_text,
    paragraph_template_detect,
    winnow_split_contamination,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("paragraph_dedup_example")
spark.sparkContext.setLogLevel("ERROR")

print("== 1. per-document paragraph duplication profile ==")
prof = ccnet_paragraph_dedup(spark, sf)
prof.orderBy(prof.dup_share_e6.desc()).show(5)

print("== 2. where the duplicates live (0=head, 1=middle, 2=tail) ==")
paragraph_position_bias(spark, sf).orderBy("tercile").show()

print("== 3. the prune transform (rebuilt docs, fingerprinted) ==")
pruned = paragraph_prune_text(spark, sf)
pruned.orderBy(pruned.n_removed.desc()).show(5)

print("== 4. per-source savings report ==")
sav = paragraph_dedup_savings(spark, sf)
sav.orderBy(sav.savings_e6.desc()).show(5)

print("== 5. cross-split substring leaks (train = doc_id % 10 < 8) ==")
leaks = winnow_split_contamination(spark, sf)
n = leaks.count()
print(f"{n} eval docs share >=2 winnowing fingerprints with train")
leaks.orderBy(leaks.total_shared_fp.desc()).show(5)

print("== 6. template vs re-quote classification (r13) ==")
tmpl = paragraph_template_detect(spark, sf)
tmpl.orderBy(tmpl.n_docs.desc()).show(5, truncate=40)

print("== 7. near-dup paragraphs: sketch pairs -> keep verdict ==")
pairs = paragraph_minhash_pairs(spark, sf)
print(f"{pairs.count()} banded near-dup paragraph pairs")
keep = paragraph_minhash_keep(spark, sf)
keep.orderBy(keep.inst_removed.desc()).show(5, truncate=24)

print("== 8. longest shared runs + mirrored prefixes ==")
runs = longest_shared_run_pairs(spark, sf)
runs.orderBy(runs.longest_run_words.desc()).show(5)
pref = doc_prefix_dup_partners(spark, sf)
pref.orderBy(pref.width.desc(), pref.n_partners.desc()).show(5)

spark.stop()
