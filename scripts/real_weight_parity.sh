#!/bin/sh
# One-command real-weight parity flow (VERDICT round 1 item 2; rehearsal
# mode VERDICT round 2 item 3).
#
# Real run (where egress exists, AFTER scripts/download_assets.sh):
#
#   sh scripts/download_assets.sh && sh scripts/real_weight_parity.sh
#
# Rehearsal run (any environment; fabricates synthetic DeepMind-layout +
# torchvision-layout assets, then drives the IDENTICAL chain end to end):
#
#   sh scripts/real_weight_parity.sh --rehearsal
#
# Steps (same code path in both modes):
#  1. convert every checkpoint to msgpack (convert/cli.py)
#  2. record canonical-clip logits goldens (--dump-golden) into $DATA_DIR/golden/
#     -> tests/test_real_weight_golden.py turns on (skip count 0)
#  3. run attack config #1 (single-video) and #3 (universal) against the
#     converted I3D weights and print the fooling report for comparison with
#     the reference paper (arXiv:2002.05123) / README.md:71 artifact.
#
# Env knobs: DATA_DIR (default "data"; rehearsal default "data/rehearsal"),
# REHEARSAL=1 (same as --rehearsal).
set -e
cd "$(dirname "$0")/.."

REHEARSAL="${REHEARSAL:-0}"
for arg in "$@"; do
  [ "$arg" = "--rehearsal" ] || [ "$arg" = "--dry-run" ] && REHEARSAL=1
done

if [ "$REHEARSAL" = "1" ]; then
  DATA_DIR="${DATA_DIR:-data/rehearsal}"
  # force CPU in-process (JAX_PLATFORMS is unreliable under TPU-pinned
  # sitecustomize; runners/common.apply_platform_env)
  export FLICKER_PLATFORM="${FLICKER_PLATFORM:-cpu}"
  # tiny geometry: CPU-fast, structurally faithful (even dims for prepack)
  FRAMES=8; SIZE=32; MAX_STEPS=5
  echo "== REHEARSAL: fabricating synthetic assets under $DATA_DIR =="
  python -m flickering_adversarial_video_tpu.convert.fake_assets "$DATA_DIR" \
      --frames $FRAMES --size $SIZE
else
  DATA_DIR="${DATA_DIR:-data}"
  FRAMES=90; SIZE=224; MAX_STEPS=""
fi
GOLD="$DATA_DIR/golden"
mkdir -p "$GOLD"

CONVERT="python -m flickering_adversarial_video_tpu.convert.cli"

echo "== convert + golden: I3D (DeepMind rgb_imagenet layout) =="
$CONVERT i3d "$DATA_DIR/checkpoints/rgb_imagenet/model.ckpt" \
    --out "$GOLD/i3d_kinetics400.msgpack" \
    --dump-golden "$GOLD/i3d_kinetics400.npz"

# Kinetics-600 I3D: prefix-less variable names + 600-way head (the
# reference's eval_type='rgb600' restore, kinetics_i3d_utils.py:47-56).
# Unconditional — the one egress day must pin EVERY converter family
# (VERDICT r4 item 4); a missing download fails loudly here.
echo "== convert + golden: I3D rgb600 (Kinetics-600 layout) =="
$CONVERT i3d "$DATA_DIR/checkpoints/rgb_scratch_kin600/model.ckpt" \
    --eval-type rgb600 \
    --out "$GOLD/i3d_kinetics600.msgpack" \
    --dump-golden "$GOLD/i3d_kinetics600.npz"

for m in r3d_18 mc3_18 r2plus1d_18; do
  if [ -f "$DATA_DIR/$m.pth" ]; then
    echo "== convert + golden: $m (torchvision layout) =="
    $CONVERT "$m" "$DATA_DIR/$m.pth" \
        --out "$GOLD/$m.msgpack" \
        --dump-golden "$GOLD/$m.npz"
  fi
done

# ig65m r2plus1d_34 heads (torch.hub moabitcoin/ig65m-pytorch; the
# reference's MODELS table model.py:47-52: 32-frame/359-way,
# 8-frame/487-way).  Unconditional, same rationale as rgb600.
for ig in r2plus1d_34_32_ig65m r2plus1d_34_8_ig65m; do
  echo "== convert + golden: $ig (r2plus1d_34) =="
  $CONVERT r2plus1d_34 "$DATA_DIR/$ig.pth" \
      --out "$GOLD/$ig.msgpack" \
      --dump-golden "$GOLD/$ig.npz"
done

echo "== golden verification (the permanent test; must NOT skip) =="
# no extra -q: pytest.ini's addopts already has -q, and -qq would suppress
# the "N passed" summary line the rehearsal test asserts on
FLICKER_GOLDEN_DIR="$GOLD" python -m pytest tests/test_real_weight_golden.py

# derive a config pointing CKPT_PATH at the converted msgpack (and, in
# rehearsal, the data paths/steps at the fabricated tiny assets)
DATA_DIR="$DATA_DIR" GOLD="$GOLD" REHEARSAL="$REHEARSAL" MAX_STEPS="$MAX_STEPS" \
python - <<'EOF'
import os
import yaml

cfg = yaml.safe_load(open("configs/run_config.yml"))
gold = os.environ["GOLD"]
data_dir = os.environ["DATA_DIR"]
cfg["MODEL"]["CKPT_PATH"] = f"{gold}/i3d_kinetics400.msgpack"
if os.environ.get("REHEARSAL") == "1":
    steps = int(os.environ["MAX_STEPS"])
    sv, un = cfg["SINGLE_VIDEO_ATTACK"], cfg["UNIVERSAL_ATTACK"]
    # f32 victims: the fabricator labeled the npy clips with the model's own
    # f32 clean predictions (fake_assets.write_npy_clips margin rule); bf16
    # could flip a random-weight argmax and re-trigger the skip rule
    sv["COMPUTE_DTYPE"] = "float32"
    un["COMPUTE_DTYPE"] = "float32"
    sv["NPY_PATH"] = f"{data_dir}/videos_for_tests/npy/"
    sv["PKL_RESULT_PATH"] = f"{data_dir}/result/single_video/"
    sv["MAX_NUM_STEP"] = steps
    un["TF_RECORDS_TRAIN_PATH"] = [f"{data_dir}/tfrecord/test_all_cls/"]
    un["TF_RECORDS_VAL_PATH"] = [f"{data_dir}/tfrecord/test_all_cls/"]
    un["NUM_OF_TRAIN_TF_RECORDS"] = 2
    un["NUM_OF_VAL_TF_RECORDS"] = 2
    un["NUM_OF_VID_EACH_TF_RECORDS"] = 4
    un["BATCH_SIZE"] = 4
    un["MAX_NUM_STEP"] = steps
    un["PKL_RESULT_PATH"] = f"{data_dir}/result/universal/"
yaml.safe_dump(cfg, open(f"{gold}/run_config_real.yml", "w"))
print(f"wrote {gold}/run_config_real.yml")
EOF

if [ "$REHEARSAL" = "1" ]; then
  SV_ARGS="--frames $FRAMES --size $SIZE --stop-rule early --max-videos 1"
  UN_ARGS="--frames $FRAMES --size $SIZE --max-steps $MAX_STEPS"
else
  SV_ARGS=""; UN_ARGS=""
fi

# No `|| true` here: a failure anywhere in the chain must FAIL the script —
# the rehearsal exists precisely to surface such bugs before the one real run.
echo "== fooling parity: config #1 (single-video) =="
python -m flickering_adversarial_video_tpu.runners.single_video \
    "$GOLD/run_config_real.yml" $SV_ARGS

echo "== fooling parity: config #3 (universal) =="
python -m flickering_adversarial_video_tpu.runners.universal \
    "$GOLD/run_config_real.yml" $UN_ARGS

if [ "$REHEARSAL" = "1" ]; then
  echo "REHEARSAL COMPLETE: convert -> golden -> pytest -> config #1 -> config #3 all ran."
else
  echo "done — compare fooling rates with the paper's Table 1 (within 1%)."
fi
