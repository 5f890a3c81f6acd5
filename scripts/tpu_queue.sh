#!/bin/bash
# Serial TPU job queue for the remaining A/B captures (round-5).
#
# /tmp is wiped on host restarts: both A/B datasets regenerate
# deterministically from fixed seeds, and the *_results.json files are
# re-seeded below from the committed reports/ copies so the report folds
# old + new rows together. Jobs are idempotent — each is skipped when
# its completion SENTINEL exists (round-4 advisor #1: the trainer writes
# best-loss checkpoints mid-run, so checkpoint existence is NOT a
# job-done marker; the sentinel is touched only after the train command
# exits 0, and eval only scores sentineled checkpoints). ONE queue only:
# the tunnel serializes device claims, and a killed client can wedge the
# far end for hours (ROADMAP operations note), so every job gets a
# generous `timeout` (e18 needs ~37+ min -> 4800 s; the 60-epoch mosaic
# arm gets 7200 s).
set -x -o pipefail
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

# ---- phase 1: north-star 640px A/B, remaining ours arms ----
D=/tmp/northstar_ab
if [ ! -f $D/meta.json ]; then
  JAX_PLATFORMS=cpu timeout 900 python scripts/northstar_ab.py gen --epochs 12 || exit 1
  JAX_PLATFORMS=cpu timeout 120 python scripts/northstar_ab.py gen-epochs --epochs 18 || exit 1
fi
[ -f $D/plan_ours_nm36_s0.yaml ] || \
  JAX_PLATFORMS=cpu timeout 120 python scripts/northstar_ab.py gen-nomosaic --epochs 36 || exit 1
if [ ! -f $D/northstar_results.json ]; then
  # committed scores (PARITY_AB.md + reports/northstar_results.json)
  cp -f reports/northstar_results.json $D/northstar_results.json || exit 1
fi
# seed sentinels for arms already scored in the committed results (their
# runs completed in earlier rounds)
python - <<'EOF'
import json, pathlib
d = pathlib.Path("/tmp/northstar_ab")
for key in json.load(open(d / "northstar_results.json")):
    (d / f"ab640_{key}.done").touch()
EOF

# nm36 first: it pairs with the round-5 CPU torch arm AND donates the
# shared-init fine-tune weights. The 12/18-epoch voc-recipe arms are
# no-signal budgets (torch mAP < 0.2 there — see PARITY_AB.md), so they
# only run when explicitly asked for via RUN_NOSIGNAL_ARMS=1.
EXTRA_ARMS=""
if [ "${RUN_NOSIGNAL_ARMS:-0}" = 1 ]; then
  EXTRA_ARMS="plan_ours_s1.yaml plan_ours_s2.yaml plan_ours_e18_s0.yaml \
              plan_ours_e18_s1.yaml plan_ours_e18_s2.yaml"
fi
for job in plan_ours_nm36_s0.yaml $EXTRA_ARMS; do
  name=$(basename "$job" .yaml); name=${name#plan_}
  sent="$D/ab640_${name}.done"
  tmo=3600; case "$job" in *e18*|*nm36*) tmo=4800;; esac
  if [ ! -f "$sent" ]; then
    if timeout $tmo python scripts/northstar_ab.py train-ours --plan "$job" \
        2>&1 | tail -3; then
      touch "$sent"
    fi
  fi
  timeout 900 python scripts/northstar_ab.py eval 2>&1 | tail -8
  cp -f $D/northstar_results.json reports/northstar_results.json
  JAX_PLATFORMS=cpu timeout 120 python scripts/northstar_ab.py report
done

# ---- phase 1b: shared-init fine-tune pair (ours leg; the torch leg is
# a CPU job — run it with RUN_CPU_ARMS=1, below) ----
if [ -f "$D/ab640_ours_nm36_s0.done" ]; then
  [ -f $D/plan_ours_ft8_s0.yaml ] || \
    JAX_PLATFORMS=cpu timeout 600 python scripts/northstar_ab.py gen-finetune \
      --epochs 8 --donor $D/ab640_ours_nm36_s0.msgpack
  if [ ! -f "$D/ab640_ours_ft8_s0.done" ]; then
    if timeout 3600 python scripts/northstar_ab.py train-ours \
        --plan plan_ours_ft8_s0.yaml 2>&1 | tail -3; then
      touch "$D/ab640_ours_ft8_s0.done"
    fi
  fi
  timeout 900 python scripts/northstar_ab.py eval 2>&1 | tail -8
  cp -f $D/northstar_results.json reports/northstar_results.json
  JAX_PLATFORMS=cpu timeout 120 python scripts/northstar_ab.py report
fi

# ---- phase 2: mosaic A/B follow-ups (3rd seed + complete 60-epoch arm) ----
M=/tmp/mosaic_ab
if [ ! -f $M/meta.json ]; then
  JAX_PLATFORMS=cpu timeout 900 python scripts/mosaic_ab.py gen || exit 1
  JAX_PLATFORMS=cpu timeout 120 python scripts/mosaic_ab.py gen-extra || exit 1
fi
if [ ! -f $M/mosaic_results.json ]; then
  cp -f reports/mosaic_results.json $M/mosaic_results.json || exit 1
fi
python - <<'EOF'
import json, pathlib
d = pathlib.Path("/tmp/mosaic_ab")
name = {"ours_mosaic": "ab_mosaic.msgpack", "ours_plain": "ab_plain.msgpack",
        "torch_mosaic": "ab_torchmos.pth",
        "ours_mosaic60": "ab_mosaic60.msgpack",
        "ours_plain60": "ab_plain60.msgpack"}
for key in json.load(open(d / "mosaic_results.json")):
    ck = name.get(key, "ab_" + key.replace("ours_", "").replace(
        "torch_mosaic_", "torchmos_") + (".pth" if key.startswith("torch")
                                         else ".msgpack"))
    (d / (ck + ".done")).touch()
EOF
for job in ours_mosaic2s2 ours_mosaic60c; do
  ck=$M/ab_${job#ours_}.msgpack
  tmo=3600; [ "$job" = ours_mosaic60c ] && tmo=7200
  if [ ! -f "$ck.done" ]; then
    if timeout $tmo python scripts/mosaic_ab.py train --plan "$job" \
        2>&1 | tail -3; then
      touch "$ck.done"
    fi
  fi
  timeout 900 python scripts/mosaic_ab.py eval-extra 2>&1 | tail -4
  cp -f $M/mosaic_results.json reports/mosaic_results.json
  JAX_PLATFORMS=cpu timeout 120 python scripts/mosaic_ab.py report
done

# ---- CPU arms (torch legs; run separately so the TPU queue above is
# never blocked on an 18-min/epoch CPU train): RUN_CPU_ARMS=1 $0 ----
if [ "${RUN_CPU_ARMS:-0}" = 1 ]; then
  if [ ! -f "$D/ab640_torch_nm36_s0.done" ]; then
    if nice -n 19 timeout 50000 python scripts/northstar_ab.py train-torch \
        --plan plan_torch_nm36_s0.yaml --seed 0 2>&1 | tail -3; then
      touch "$D/ab640_torch_nm36_s0.done"
    fi
  fi
  if [ -f $D/plan_torch_ft8_s0.yaml ] && [ ! -f "$D/ab640_torch_ft8_s0.done" ]; then
    if nice -n 19 timeout 20000 python scripts/northstar_ab.py train-torch \
        --plan plan_torch_ft8_s0.yaml --seed 0 2>&1 | tail -3; then
      touch "$D/ab640_torch_ft8_s0.done"
    fi
  fi
  timeout 900 python scripts/northstar_ab.py eval 2>&1 | tail -8
  cp -f $D/northstar_results.json reports/northstar_results.json
  JAX_PLATFORMS=cpu timeout 120 python scripts/northstar_ab.py report
fi
echo QUEUE_DONE
