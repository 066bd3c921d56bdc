#!/bin/bash
# Cross-validate bella_tpu against the ACTUAL reference CPU binary
# (PASSIONLab/BELLA @ /root/reference) on identical simulated inputs.
# Builds the reference out-of-tree (no writes into the reference repo),
# runs both tools on 4 configurations, scores both with the evaluator
# port. Results recorded in BASELINE.md.
set -e
REF=${REF:-/root/reference}
BUILD=${BUILD:-/root/repo/.refbuild}
export PYTHONPATH=/root/repo JAX_PLATFORMS=${JAX_PLATFORMS:-cpu} PALLAS_AXON_POOL_IPS=

mkdir -p "$BUILD" && cd "$BUILD"

if [ ! -x bella ]; then
  # makefile-nersc:54-58 recipe, out-of-tree
  gcc -O3 -fopenmp -w -c $REF/kmercode/Buffer.c -o Buffer.o
  gcc -O3 -fopenmp -w -std=gnu99 -c $REF/kmercode/fq_reader.c -o fq_reader.o
  gcc -O3 -fopenmp -w -c $REF/kmercode/hash_funcs.c -o hash_funcs.o
  gcc -w -O3 -c $REF/optlist/optlist.c -o optlist.o
  g++ -O3 -fopenmp -w -std=c++11 -c $REF/kmercode/Kmer.cpp -o Kmer.o
  g++ -O3 -w -I$REF/libbloom -I$REF/libbloom/murmur2 -c $REF/libbloom/bloom64.cpp -o bloom64.o
  g++ -x c++ -O3 -w -I$REF/libbloom/murmur2 -c $REF/libbloom/murmur2/MurmurHash2.c -o murmur2.o
  g++ -std=c++14 -w -O3 -DLINUX -I$REF -I$REF/include/common/GTgraph/sprng2.0-lite/include \
      -I$REF/loganGPU -I$REF/seqan -mavx2 -fopenmp -fpermissive -o bella \
      Buffer.o fq_reader.o hash_funcs.o optlist.o Kmer.o bloom64.o murmur2.o \
      $REF/src/main.cpp -lpthread -lz
fi

python - <<'PY'
from bella_tpu.io.simulate import random_genome, sample_reads, write_fastq, write_truth
g = random_genome(100_000, seed=101)
reads, truth = sample_reads(g, 500, mean_len=3000, min_len=1200, error_rate=0.15, seed=102, circular=False)
write_fastq("sim15.fastq", reads); write_truth("sim15.truth", truth)
open("sim15.fofn","w").write(f"{__import__('os').getcwd()}/sim15.fastq\n")
g = random_genome(100_000, seed=201)
reads, truth = sample_reads(g, 300, mean_len=5000, min_len=2000, error_rate=0.005, seed=202, circular=False)
write_fastq("hifi.fastq", reads); write_truth("hifi.truth", truth)
open("hifi.fofn","w").write(f"{__import__('os').getcwd()}/hifi.fofn\n".replace("hifi.fofn","hifi.fastq"))
PY

run() { timeout 600 "$@" || true; }   # ref binary segfaults at exit on some configs (after writing output)
run ./bella -f sim15.fofn -o ref_m4 -k 17 -e 0.15
run ./bella -f sim15.fofn -o ref_skip -k 17 --skip-alignment
run ./bella -f sim15.fofn -o ref_w7 -k 17 -e 0.15 -w 7
run ./bella -f hifi.fofn -o ref_hifi -k 17 -e 0.005 --split-count 2 --paf
run python -m bella_tpu.cli -f sim15.fofn -o tpu_m4 -k 17 -e 0.15
run python -m bella_tpu.cli -f sim15.fofn -o tpu_skip -k 17 --skip-alignment
run python -m bella_tpu.cli -f sim15.fofn -o tpu_w7 -k 17 -e 0.15 -w 7
run python -m bella_tpu.cli -f hifi.fofn -o tpu_hifi -k 17 -e 0.005 --split-count 2 --paf

python - <<'PY'
from bella_tpu.eval import evaluate_sets, load_truth, parse_bella, parse_paf, truth_pairs
G15 = truth_pairs(load_truth("sim15.truth"), 2000)
Gh = truth_pairs(load_truth("hifi.truth"), 2000)
for f, G, p in [("ref_m4.out", G15, parse_bella), ("tpu_m4.out", G15, parse_bella),
                ("ref_skip.out", G15, parse_bella), ("tpu_skip.out", G15, parse_bella),
                ("ref_w7.out", G15, parse_bella), ("tpu_w7.out", G15, parse_bella),
                ("ref_hifi.out", Gh, parse_paf), ("tpu_hifi.out", Gh, parse_paf)]:
    print(f, evaluate_sets(p(f, 2000), G, duplicate=True))
PY
