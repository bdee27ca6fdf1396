#!/bin/bash
# Run the queued TPU measurements in order once the axon tunnel is back.
# Usage: bash tools/tpu_measure_queue.sh [outdir]   (default /tmp/measure)
# Each leg logs to $OUT/<name>.log; a leg failing does not stop the queue.
set -u
OUT=${1:-/tmp/measure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# tools/ and examples/ scripts import the package from the repo root.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%SZ)) ==="
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  echo "    exit=$? ($(date -u +%H:%M:%SZ))"
}

# 1. Headline bench (env-steps 4096-chunked + ray legs incl. 500k tris)
run bench python bench.py
# 2. Kernel roofline + flag-ablation rows (packsel/subcull/earlyout isolated)
run perf_report python tools/perf_report.py --platform axon --out "$OUT/perf_report.md"
# 3. 1080p raster frame with per-pass breakdown (re-confirm 1 ms)
run raster_1080p python examples/raster_frame.py --width 1920 --height 1080 \
    --platform axon --profile-stages --frames 8 --out "$OUT/frame_1080p.png"
# 4. Grouped dispatch compile test on axon (never yet tried on real TPU)
run raster_grouped python examples/raster_frame.py --size 256 --platform axon \
    --dispatch grouped --profile-stages --frames 8 --out "$OUT/frame_grouped.png"
# 5. Showcase regen from TPU (artifact refresh)
run showcase python examples/showcase.py --platform axon --out showcase.png
# 6. Flythrough regen on TPU (artifact refresh; 24 frames)
run flythrough python examples/flythrough.py --platform axon --out flythrough.gif
echo "ALL DONE $(date -u +%H:%M:%SZ)"
