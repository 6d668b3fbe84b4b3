#!/usr/bin/env bash
# AP-parity readiness runbook (VERDICT r3 #8).
#
# Given checkpoint files under pretrain/, runs conversion + tools/test.py
# across all detector families x datasets and emits a parity table against
# the expected reference numbers.
#
# Expected layout (any subset; missing files are skipped with a note):
#   pretrain/sam-vit-base/{model.safetensors|pytorch_model.bin}
#       HF SAM backbone weights (tools/rsprompter/download_hf_sam_pretrain_ckpt.py);
#       configs pick these up via hf_sam_pretrain_ckpt_path.
#   pretrain/<config-name>.pth
#       reference-trained mmengine checkpoints, named after the leaf config
#       they were trained with, e.g. pretrain/rsprompter_anchor-nwpu.pth
#       (reference work_dirs naming). Loaded via load_reference_checkpoint
#       (packed-MHA split + full name map; tests/test_reference_checkpoint.py).
#   pretrain/expected_ap.json   (optional)
#       {"<config-name>": {"bbox_mAP": x, "segm_mAP": y}, ...} — the
#       reference-side numbers to diff against (paper table arXiv 2306.16269
#       or a local reference eval). Deltas > 0.003 are flagged.
#
# Usage: bash tools/rsprompter/verify_parity.sh [--quick]
#   --quick limits each eval to 50 images (smoke the pipeline before the
#   full multi-hour pass).
set -u
cd "$(dirname "$0")/../.."

QUICK_OPTS=()
if [[ "${1:-}" == "--quick" ]]; then
  QUICK_OPTS=(--cfg-options val_dataloader.dataset.indices=50)
fi

# PARITY_CONFIGS / PRETRAIN_DIR env overrides exist for integration tests
# (tests/test_parity_runbook.py drives the smoke config end to end).
if [[ -n "${PARITY_CONFIGS:-}" ]]; then
  read -r -a CONFIGS <<< "$PARITY_CONFIGS"
else
  CONFIGS=(
    rsprompter_anchor-whu rsprompter_anchor-nwpu rsprompter_anchor-ssdd
    rsprompter_query-whu rsprompter_query-nwpu rsprompter_query-ssdd
    samseg-maskrcnn-whu samseg-maskrcnn-nwpu samseg-maskrcnn-ssdd
    samseg-mask2former-whu samseg-mask2former-nwpu samseg-mask2former-ssdd
    samdet-whu samdet-nwpu samdet-ssdd
  )
fi
export PRETRAIN_DIR="${PRETRAIN_DIR:-pretrain}"

mkdir -p work_dirs/parity
TABLE=work_dirs/parity/parity_table.txt
: > "$TABLE"
printf '%-28s %-10s %-10s %s\n' "config" "bbox_mAP" "segm_mAP" "checkpoint" | tee -a "$TABLE"

ran=0
for name in "${CONFIGS[@]}"; do
  ckpt="${PRETRAIN_DIR}/${name}.pth"
  if [[ ! -f "$ckpt" ]]; then
    printf '%-28s %-10s %-10s %s\n' "$name" "-" "-" "MISSING $ckpt" | tee -a "$TABLE"
    continue
  fi
  log="work_dirs/parity/${name}.log"
  echo "== $name ($ckpt) =="
  if ! python tools/test.py "configs/rsprompter/${name}.py" "$ckpt" \
      "${QUICK_OPTS[@]}" > "$log" 2>&1; then
    printf '%-28s %-10s %-10s %s\n' "$name" "FAIL" "FAIL" "see $log" | tee -a "$TABLE"
    continue
  fi
  bbox=$(grep -oP 'coco/bbox_mAP: \K[0-9.na]+' "$log" | tail -1)
  segm=$(grep -oP 'coco/segm_mAP: \K[0-9.na]+' "$log" | tail -1)
  printf '%-28s %-10s %-10s %s\n' "$name" "${bbox:-?}" "${segm:-?}" "$ckpt" | tee -a "$TABLE"
  ran=$((ran+1))
done

echo
if [[ -f "${PRETRAIN_DIR}/expected_ap.json" ]]; then
  python - "$TABLE" <<'EOF'
import json, sys
import os
expected = json.load(open(os.path.join(os.environ.get("PRETRAIN_DIR", "pretrain"), "expected_ap.json")))
rows = [l.split() for l in open(sys.argv[1]).read().splitlines()[1:]]
print(f"{'config':28s} {'metric':10s} {'got':>8s} {'want':>8s} {'delta':>8s}")
bad = 0
for r in rows:
    if len(r) < 3 or r[0] not in expected:
        continue
    for metric, col in (("bbox_mAP", 1), ("segm_mAP", 2)):
        want = expected[r[0]].get(metric)
        try:
            got = float(r[col])
        except ValueError:
            continue
        if want is None:
            continue
        d = got - want
        flag = "  <-- OUT OF BAND (>0.003)" if abs(d) > 0.003 else ""
        bad += bool(flag)
        print(f"{r[0]:28s} {metric:10s} {got:8.4f} {want:8.4f} {d:+8.4f}{flag}")
print(f"\n{bad} metric(s) out of the +-0.3 AP-point parity band" if bad
      else "\nall evaluated metrics within the parity band")
EOF
else
  echo "(no pretrain/expected_ap.json — measured table only, no diff)"
fi

if [[ $ran -eq 0 ]]; then
  echo
  echo "No trained checkpoints found under pretrain/. To run the parity pass:"
  echo "  1. python tools/rsprompter/download_hf_sam_pretrain_ckpt.py  # SAM weights"
  echo "  2. place reference-trained <config-name>.pth files under pretrain/"
  echo "  3. (optional) pretrain/expected_ap.json with the reference numbers"
  echo "  4. bash tools/rsprompter/verify_parity.sh --quick  # then without --quick"
  exit 2
fi
