"""Round-5 verify drive: golden conformance of every flagship path on the
real chip, including the r5 device-planned cluster assembly and the RLE
device-aligner traceback (run via scripts/r5_session1.sh)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MINI = os.path.join(here, "tests/data/Alp_V_locus.fasta")
LOCI = os.path.join(here, "tests/data/Loci.fasta")
REF = os.path.join(here, "tests/data/Alp_V_ref.fasta")

import kmergma_tpu as km

GOLDEN3 = [
    "AM773548.1 | dist = 8.1 | MatchPos = 6852:7140 | GenomePos = 0 | Len = 289",
    "AM773548.1 | dist = 24.87 | MatchPos = 23907:24201 | GenomePos = 0 | Len = 295",
    "AM773548.1 | dist = 10.99 | MatchPos = 33845:34133 | GenomePos = 0 | Len = 289",
]

a = km.find_genes(genome_path=MINI, ref_path=REF, verbose=False)[0]
assert [h.description for h in a] == GOLDEN3, [h.description for h in a]
print("1. single-profile mini golden ok (device aligner RLE traceback)", flush=True)

res = km.find_genes(genome_path=LOCI, ref_path=REF, do_return_hit_loci=True, verbose=False)
assert res[1] == [8543, 20425, 221912, 234018, 450875, 467930, 477868], res[1]
print(f"2. Loci aligned hit-loci golden ok ({len(res[0])} hits)", flush=True)

c = km.find_genes_cluster_mode(
    genome_path=MINI, ref_path=REF,
    kmer_dist_thrs=[35.0, 31.0, 38.0, 34.0, 27.0, 27.0], buffer=100, verbose=False,
)[0]
assert [h.description for h in c] == [
    "AM773548.1 | Dist = 20.17 | KFV = 3 | MatchPos = 6852:7139 | GenomePos = 0 | Len = 288",
    "AM773548.1 | Dist = 33.96 | KFV = 4 | MatchPos = 23907:24193 | GenomePos = 0 | Len = 287",
    "AM773548.1 | Dist = 26.17 | KFV = 3 | MatchPos = 33845:34132 | GenomePos = 0 | Len = 288",
], [h.description for h in c]
print("3. cluster-mode mini golden ok", flush=True)

# 4. cluster mode on Loci: three of four contigs are >= the fused cutoff,
# so the TPU takes the r5 device-planned path - its hits must equal the
# host-planned path's bit for bit
from kmergma_tpu.models.omn_miner import mine_genome_clusters
from kmergma_tpu.ops.reference import cluster_ref_api, eliminate_null_params

clusters = eliminate_null_params(cluster_ref_api(REF, 6, cutoffs=[7, 12, 20, 25]))
thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][: len(clusters.profiles)]
r1 = mine_genome_clusters(LOCI, clusters.profiles, thr_vec=thrs)
os.environ["KMERGMA_DEVPLAN"] = "0"
r2 = mine_genome_clusters(LOCI, clusters.profiles, thr_vec=thrs)
del os.environ["KMERGMA_DEVPLAN"]
d1 = [h.description for h in r1.hits]
d2 = [h.description for h in r2.hits]
assert d1 == d2, (d1, d2)
print(f"4. cluster Loci planned == host-planned ({len(d1)} hits)", flush=True)
for d in d1:
    print("   ", d, flush=True)
print("=== drive ok ===", flush=True)
