#!/bin/bash
# Serial TPU measurement suite: run after any kernel/driver perf change.
# The tunnel TPU is exclusive -- run this alone, in the foreground.
# Results append to ${OUT:-/tmp/tpu_bench_results.jsonl} as JSON lines.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_bench_results.jsonl}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}

run() {
  local label=$1; shift
  echo "=== $label: $*" >&2
  # stamp the tunnel state (trivial-op round-trip latency) into the row so
  # later readers can adjudicate throughput spreads (VERDICT r4 item 6)
  local probe
  probe=$(timeout 180 python scripts/tunnel_probe.py 2>/dev/null | tail -1)
  local t0=$SECONDS
  local line rc
  line=$(set -o pipefail; timeout "${STEP_TIMEOUT:-1200}" "$@" 2>/dev/null | tail -1)
  rc=$?
  # keep the jsonl machine-readable: non-JSON last lines (stray prints,
  # partial output from a killed step) become null instead of corrupting
  # the row
  probe=$(python -c 'import json,sys; s=sys.argv[1]; json.loads(s); print(s)' "${probe:-null}" 2>/dev/null || echo null)
  line=$(python -c 'import json,sys; s=sys.argv[1]; json.loads(s); print(s)' "${line:-null}" 2>/dev/null || echo null)
  echo "{\"step\": \"$label\", \"rc\": $rc, \"wall_s\": $((SECONDS-t0)), \"tunnel\": $probe, \"result\": $line}" >> "$OUT"
  echo "$label rc=$rc probe=${probe:-null} ${line:0:160}" >&2
}

run clearsky_1800      python bench.py
run allsky_1800        python scripts/bench_allsky.py
run allsky_28800       python scripts/bench_allsky.py --ncol 28800
run allsky_1800_staged python scripts/bench_allsky.py --core staged
run gcm_1m_resident    python scripts/bench_gcm.py --resident --lw-only
run gcm_1m_streamed    python scripts/bench_gcm.py --lw-only
run gcm_1m_streamed_mixed python scripts/bench_gcm.py --lw-only --precision mixed
echo "done -> $OUT" >&2
