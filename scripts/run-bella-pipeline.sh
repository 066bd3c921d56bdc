#!/usr/bin/env bash
# Full pipeline + evaluation + CSV summary (role of
# script/run-bella-pipeline.sh): run bella_tpu on a fofn, score against
# ground truth, append a CSV row of parameters and metrics.
set -euo pipefail

usage() {
  echo "usage: $0 -f fofn -G truth -o outprefix [-k 17] [-x 7] [-e 0.15] [-u 8] [-l 2] [-w 0] [--csv results.csv]" >&2
  exit 2
}

K=17 X=7 E=0.15 U=8 L=2 W=0 CSV=results.csv FOFN= TRUTH= OUT=
while [[ $# -gt 0 ]]; do
  case "$1" in
    -f) FOFN=$2; shift 2;;
    -G) TRUTH=$2; shift 2;;
    -o) OUT=$2; shift 2;;
    -k) K=$2; shift 2;;
    -x) X=$2; shift 2;;
    -e) E=$2; shift 2;;
    -u) U=$2; shift 2;;
    -l) L=$2; shift 2;;
    -w) W=$2; shift 2;;
    --csv) CSV=$2; shift 2;;
    *) usage;;
  esac
done
[[ -n "$FOFN" && -n "$TRUTH" && -n "$OUT" ]] || usage

start=$(date +%s)
python -m bella_tpu.cli -f "$FOFN" -o "$OUT" -k "$K" -x "$X" -e "$E" \
  -u "$U" -l "$L" -w "$W" > "$OUT.stdout" 2> "$OUT.log"
end=$(date +%s)

metrics=$(python -m bella_tpu.eval.evaluate -G "$TRUTH" -B "$OUT.out" | tail -1)
rc=$(echo "$metrics" | sed -E 's/.*RC=([0-9.]+)%.*/\1/')
pr=$(echo "$metrics" | sed -E 's/.*PR=([0-9.]+)%.*/\1/')
f1=$(echo "$metrics" | sed -E 's/.*F1=([0-9.]+)%.*/\1/')
nkmer=$(head -1 "$OUT.stdout")

[[ -f "$CSV" ]] || echo "k,window,lower,upper,xdrop,error,nkmer,seconds,recall,precision,f1" > "$CSV"
echo "$K,$W,$L,$U,$X,$E,$nkmer,$((end-start)),$rc,$pr,$f1" >> "$CSV"
echo "$metrics"
