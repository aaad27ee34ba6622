#!/bin/sh
# One-command real-weight parity flow (VERDICT round 1, item 2).
# Run where egress exists, AFTER scripts/download_assets.sh:
#
#   sh scripts/download_assets.sh && sh scripts/real_weight_parity.sh
#
# Steps:
#  1. convert every downloaded checkpoint to msgpack (convert/cli.py)
#  2. record canonical-clip logits goldens (--dump-golden) into data/golden/
#     -> tests/test_real_weight_golden.py turns on permanently
#  3. run attack config #1 (single-video) and #3 (universal) against the real
#     I3D weights and print the fooling report for comparison with the
#     reference paper (arXiv:2002.05123) / README.md:71 artifact.
set -e
cd "$(dirname "$0")/.."
mkdir -p data/golden

CONVERT="python -m flickering_adversarial_video_tpu.convert.cli"

echo "== convert + golden: I3D (DeepMind rgb_imagenet) =="
$CONVERT i3d data/checkpoints/rgb_imagenet/model.ckpt \
    --out data/golden/i3d_kinetics400.msgpack \
    --dump-golden data/golden/i3d_kinetics400.npz

for m in r3d_18 mc3_18 r2plus1d_18; do
  if [ -f "data/$m.pth" ]; then
    echo "== convert + golden: $m (torchvision) =="
    $CONVERT "$m" "data/$m.pth" \
        --out "data/golden/$m.msgpack" \
        --dump-golden "data/golden/$m.npz"
  fi
done

echo "== golden verification (the permanent test) =="
python -m pytest tests/test_real_weight_golden.py -q

# derive a config pointing CKPT_PATH at the converted msgpack
python - <<'EOF'
import yaml
cfg = yaml.safe_load(open("configs/run_config.yml"))
cfg["MODEL"]["CKPT_PATH"] = "data/golden/i3d_kinetics400.msgpack"
yaml.safe_dump(cfg, open("data/golden/run_config_real.yml", "w"))
EOF

echo "== fooling parity: config #1 (single-video) =="
python -m flickering_adversarial_video_tpu.runners.single_video \
    data/golden/run_config_real.yml || true

echo "== fooling parity: config #3 (universal) =="
python -m flickering_adversarial_video_tpu.runners.universal \
    data/golden/run_config_real.yml || true

echo "done — compare fooling rates with the paper's Table 1 (within 1%)."
