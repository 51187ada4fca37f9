#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md): the identical flagship job at
# local[8] (N) and local[32] (4N) on the same deterministic input; report
# throughput at both + efficiency T32/(4·T8). Run from /root/repo.
set -e
DOCS="${SPARK_GRAFT_BENCH_DOCS:-200000}"
REPS="${SPARK_GRAFT_BENCH_REPS:-3}"
OUT="${1:-/tmp/graft_scaling}"
mkdir -p "$OUT"
# stage the jar once so each run measures compute, not compilation
sbt -batch package > /dev/null
for CPUS in 8 32; do
  echo "== local[$CPUS] =="
  SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_DOCS=$DOCS SPARK_GRAFT_BENCH_REPS=$REPS \
  SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
    sbt -batch 'runMain graft.Bench' 2>&1 | grep '"metric"' | sed 's/^\[info\] //' \
    | tee "$OUT/bench_cpus$CPUS.json"
done
python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
j8 = json.load(open(f"{out}/bench_cpus8.json"))
j32 = json.load(open(f"{out}/bench_cpus32.json"))
t8, t32 = j8["tokens_per_sec"], j32["tokens_per_sec"]
eff = t32 / (4 * t8)
print(json.dumps({"throughput_local8_tok_s": t8, "throughput_local32_tok_s": t32,
                  "scaling_efficiency": round(eff, 3), "tokens": j8["tokens"]}, indent=2))
EOF
