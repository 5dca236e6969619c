#!/bin/sh
# CI gate for goldrush-tpu — the analog of the reference's CI pipeline
# (azure-pipelines.yml:1-87: build, --help smoke test, end-to-end demo).
#
# Run on every snapshot before committing / shipping:
#   sh tools/ci.sh          # full: unit+parity suite, CLI smoke, bench smoke
#   sh tools/ci.sh quick    # unit suite only (CPU, no TPU contention)
#
# Exit nonzero on any failure so a red HEAD cannot ship silently.
set -e
HERE=$(cd "$(dirname "$0")/.." && pwd)
cd "$HERE"

echo "== 1/3 test suite (CPU, 8-device virtual mesh) =="
python -m pytest tests/ -x -q

if [ "$1" = "quick" ]; then
    echo "CI quick gate passed."
    exit 0
fi

echo "== 2/3 CLI smoke (--help parity surface) =="
python -m goldrush_tpu.cli help > /dev/null
GOLDRUSH_PLATFORM=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" python - <<'EOF'
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8) ok")
EOF

echo "== 3/3 bench smoke (one JSON line; real chip if available) =="
timeout 3600 python bench.py | tail -1 | python -c "
import json, sys
d = json.loads(sys.stdin.readline())
assert 'metric' in d and 'value' in d and 'vs_baseline' in d, d
print('bench ok:', d['metric'], d['value'], d['unit'])
"

echo "CI gate passed."
