#!/bin/bash
# Full-demo-scale cross-validation vs the ACTUAL reference CPU binary:
# an E. coli-sized corpus (4.6 Mbp genome, 30X, mean 6 kbp, 15% error
# = ~138 Mbp — the scale of the reference's dataset/selfSampleData demo,
# whose reads are not vendored, .MISSING_LARGE_BLOBS) run through both
# tools with identical flags and scored by the evaluator port against
# the simulator's ground truth at the reference's 2 kb cutoff
# (benchmark/evaluation.cpp:49).
#
# Builds the reference out-of-tree via crossval_reference.sh's recipe
# (reuses $BUILD/bella if present). The reference runs single-process
# OpenMP on this host; bella_tpu runs its device path (CPU backend here
# unless BELLA_CROSSVAL_TPU=1).
set -e
REF=${REF:-/root/reference}
BUILD=${BUILD:-/root/repo/.refbuild}
GENOME=${GENOME:-4600000}
COVERAGE=${COVERAGE:-30}
if [ "${BELLA_CROSSVAL_TPU:-0}" != "1" ]; then
  export PYTHONPATH=/root/repo
  export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
else
  # keep the axon site on the path: it registers the TPU backend
  export PYTHONPATH=/root/repo:/root/.axon_site
fi

if [ ! -x "$BUILD/bella" ]; then
  echo "reference binary missing; build it with scripts/crossval_reference.sh first" >&2
  exit 1
fi
cd "$BUILD"

python - <<PY
import os
from bella_tpu.io.simulate import random_genome, sample_reads, write_fastq, write_truth
G = int(os.environ.get("GENOME", "$GENOME") or "$GENOME")
C = int("$COVERAGE")
g = random_genome(G, seed=401)
n = G * C // 6000
reads, truth = sample_reads(g, n, mean_len=6000, min_len=1000,
                            error_rate=0.15, seed=402, circular=False)
write_fastq("big.fastq", reads); write_truth("big.truth", truth)
open("big.fofn", "w").write(os.getcwd() + "/big.fastq\n")
print(f"corpus: {reads.num_reads} reads, {reads.lengths.sum()/1e6:.1f} Mbp")
PY

echo "=== reference binary (this may take a while single-core) ==="
T0=$(date +%s)
timeout 14400 ./bella -f big.fofn -o ref_big -k 17 -e 0.15 \
  2> ref_big.log || true
echo "reference wall: $(( $(date +%s) - T0 )) s"
tail -3 ref_big.log

echo "=== bella_tpu ==="
T0=$(date +%s)
timeout 14400 python -m bella_tpu.cli -f big.fofn -o tpu_big \
  -k 17 -e 0.15 2> tpu_big.log || true
echo "bella_tpu wall: $(( $(date +%s) - T0 )) s"
tail -3 tpu_big.log

python - <<'PY'
from bella_tpu.eval import evaluate_sets, load_truth, parse_bella, truth_pairs
G = truth_pairs(load_truth("big.truth"), 2000)
print(f"truth pairs (>=2kb): {len(G)}")
for f in ("ref_big.out", "tpu_big.out"):
    try:
        print(f, evaluate_sets(parse_bella(f, 2000), G, duplicate=True))
    except FileNotFoundError:
        print(f, "MISSING")
PY
