#!/bin/bash
# Serial TPU job queue for the remaining A/B captures (round-4 handoff).
#
# /tmp is wiped on host restarts: both A/B datasets regenerate
# deterministically from fixed seeds, and the *_results.json files are
# re-seeded below with the committed scores (PARITY_AB.md tables) so the
# report folds old + new rows together. Jobs are idempotent — each is
# skipped when its checkpoint already exists — so this script can be
# re-run after any interruption. ONE queue only: the tunnel serializes
# device claims, and a killed client can wedge the far end for hours
# (ROADMAP operations note), so every job gets a generous `timeout`.
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

# ---- phase 1: north-star 640px A/B, remaining ours arms ----
D=/tmp/northstar_ab
if [ ! -f $D/meta.json ]; then
  JAX_PLATFORMS=cpu timeout 900 python scripts/northstar_ab.py gen --epochs 12 || exit 1
  JAX_PLATFORMS=cpu timeout 120 python scripts/northstar_ab.py gen-epochs --epochs 18 || exit 1
fi
if [ ! -f $D/northstar_results.json ]; then
  # committed scores (PARITY_AB.md + reports/northstar_results.json)
  cp -f reports/northstar_results.json $D/northstar_results.json 2>/dev/null || \
  python - <<'EOF'
import json
res = {"torch_s0": {"mAP@0.5": 0.0019, "mAP@0.5:0.95": 0.0003, "epochs": 12},
       "torch_e18_s0": {"mAP@0.5": 0.0057, "mAP@0.5:0.95": 0.0014,
                        "epochs": 18}}
json.dump(res, open("/tmp/northstar_ab/northstar_results.json", "w"), indent=1)
EOF
fi
declare -A CK=(
  [plan_ours_s0.yaml]=ab640_ours_s0.msgpack
  [plan_ours_e18_s0.yaml]=ab640_ours_e18_s0.msgpack
  [plan_ours_s1.yaml]=ab640_ours_s1.msgpack
  [plan_ours_s2.yaml]=ab640_ours_s2.msgpack
  [plan_ours_e18_s1.yaml]=ab640_ours_e18_s1.msgpack
  [plan_ours_e18_s2.yaml]=ab640_ours_e18_s2.msgpack
)
for job in plan_ours_s0.yaml plan_ours_e18_s0.yaml plan_ours_s1.yaml \
           plan_ours_s2.yaml plan_ours_e18_s1.yaml plan_ours_e18_s2.yaml; do
  if [ ! -f "$D/${CK[$job]}" ]; then
    timeout 2400 python scripts/northstar_ab.py train-ours --plan "$job" \
      2>&1 | tail -3
  fi
  timeout 900 python scripts/northstar_ab.py eval 2>&1 | tail -8
  cp -f $D/northstar_results.json reports/northstar_results.json
  JAX_PLATFORMS=cpu timeout 120 python scripts/northstar_ab.py report
done

# ---- phase 2: mosaic A/B follow-ups (3rd seed + complete 60-epoch arm) ----
M=/tmp/mosaic_ab
if [ ! -f $M/meta.json ]; then
  JAX_PLATFORMS=cpu timeout 900 python scripts/mosaic_ab.py gen || exit 1
  JAX_PLATFORMS=cpu timeout 120 python scripts/mosaic_ab.py gen-extra || exit 1
fi
if [ ! -f $M/mosaic_results.json ]; then
  cp -f reports/mosaic_results.json $M/mosaic_results.json 2>/dev/null || \
  python - <<'EOF'
import json
res = {
 "ours_mosaic":   {"mAP@0.5": 0.3413, "mAP@0.5:0.95": 0.2655},
 "ours_mosaic2":  {"mAP@0.5": 0.4293, "mAP@0.5:0.95": 0.3386},
 "ours_mosaic2s1":{"mAP@0.5": 0.4884, "mAP@0.5:0.95": 0.3848},
 "ours_plain":    {"mAP@0.5": 0.4845, "mAP@0.5:0.95": 0.3717},
 "torch_mosaic":  {"mAP@0.5": 0.4418, "mAP@0.5:0.95": 0.3426},
 "ours_mosaic60": {"mAP@0.5": 0.4588, "mAP@0.5:0.95": 0.3497},
 "ours_plain60":  {"mAP@0.5": 0.6569, "mAP@0.5:0.95": 0.5315}}
json.dump(res, open("/tmp/mosaic_ab/mosaic_results.json", "w"), indent=1)
EOF
fi
for job in ours_mosaic2s2 ours_mosaic60c; do
  ck=$M/ab_${job#ours_}.msgpack
  [ "$job" = ours_mosaic2s2 ] && ck=$M/ab_mosaic2s2.msgpack
  [ "$job" = ours_mosaic60c ] && ck=$M/ab_mosaic60c.msgpack
  if [ ! -f "$ck" ]; then
    timeout 2400 python scripts/mosaic_ab.py train --plan "$job" 2>&1 | tail -3
  fi
  timeout 900 python scripts/mosaic_ab.py eval-extra 2>&1 | tail -4
  cp -f $M/mosaic_results.json reports/mosaic_results.json
  JAX_PLATFORMS=cpu timeout 120 python scripts/mosaic_ab.py report
done
echo QUEUE_DONE
