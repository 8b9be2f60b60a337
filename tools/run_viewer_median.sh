#!/bin/sh
# VERDICT r3 item 3's "done" criterion: 5-run MEDIAN of the fwd-only viewer
# rate at 1M/1080p, stated against the reference's implied 47.2 Mpx/s bar.
# Run on the real chip: sh tools/run_viewer_median.sh
# (No set -e: a single tunnel-claim hiccup should not zero the sample set;
# the summarizer reports however many runs produced JSON.)
cd "$(dirname "$0")/.."
for i in 1 2 3 4 5; do
  timeout 300 python bench.py --scene ball --splats 1000000 --fwd-only 2>/dev/null
  sleep 5
done | python - <<'EOF'
import json
import sys

runs = [json.loads(line) for line in sys.stdin if line.strip().startswith("{")]
if not runs:
    sys.exit("no successful runs (tunnel busy? try again)")
ms = sorted(r["step_ms"] for r in runs)
mpx = sorted(r["value"] / 1e6 for r in runs)
n = len(runs)
print(f"runs: {n}")
print("step_ms:", [f"{x:.2f}" for x in ms])
print(f"MEDIAN: {ms[n // 2]:.2f} ms = {mpx[n // 2]:.2f} Mpx/s "
      f"= {mpx[n // 2] / 47.186:.4f}x the 47.2 Mpx/s viewer bar")
EOF
