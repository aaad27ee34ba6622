#!/bin/sh
# Victim weights + sample data acquisition (the reference's
# download_ckpt_and_data.sh role). Network-gated: run where egress exists.
#
#  1) DeepMind I3D Kinetics-400 checkpoint (RGB, ImageNet-pretrained):
#     https://github.com/google-deepmind/kinetics-i3d (data/checkpoints/rgb_imagenet)
#  2) torchvision video-ResNet weights (r3d_18 / mc3_18 / r2plus1d_18):
#     downloaded through torchvision's model zoo URLs.
#
# Afterwards convert once to msgpack for fast TF/torch-free loading:
#   python -m flickering_adversarial_video_tpu.convert.cli i3d \
#       data/checkpoints/rgb_imagenet/model.ckpt --out data/i3d_kinetics400.msgpack
#   python -m flickering_adversarial_video_tpu.convert.cli r2plus1d_18 \
#       data/r2plus1d_18.pth --out data/r2plus1d_18.msgpack

set -e
mkdir -p data/checkpoints

echo "== DeepMind I3D rgb_imagenet checkpoint =="
BASE=https://raw.githubusercontent.com/google-deepmind/kinetics-i3d/master/data/checkpoints/rgb_imagenet
mkdir -p data/checkpoints/rgb_imagenet
for f in checkpoint model.ckpt.data-00000-of-00001 model.ckpt.index model.ckpt.meta; do
  curl -fL "$BASE/$f" -o "data/checkpoints/rgb_imagenet/$f"
done

echo "== DeepMind I3D Kinetics-600 checkpoint (rgb600 layout) =="
BASE600=https://raw.githubusercontent.com/google-deepmind/kinetics-i3d/master/data/checkpoints/rgb_scratch_kin600
mkdir -p data/checkpoints/rgb_scratch_kin600
for f in checkpoint model.ckpt.data-00000-of-00001 model.ckpt.index model.ckpt.meta; do
  curl -fL "$BASE600/$f" -o "data/checkpoints/rgb_scratch_kin600/$f"
done

echo "== torchvision video-ResNet weights =="
curl -fL https://download.pytorch.org/models/r3d_18-b3b3357e.pth -o data/r3d_18.pth
curl -fL https://download.pytorch.org/models/mc3_18-a90a0ba3.pth -o data/mc3_18.pth
curl -fL https://download.pytorch.org/models/r2plus1d_18-91a641e6.pth -o data/r2plus1d_18.pth

echo "== ig65m r2plus1d_34 weights (torch.hub, as the reference loads them: =="
echo "== utils_cv/action_recognition/model.py:402-441 / MODELS table :47-52) =="
python - <<'EOF'
import torch

for name, ncls in (("r2plus1d_34_32_ig65m", 359), ("r2plus1d_34_8_ig65m", 487)):
    model = torch.hub.load(
        "moabitcoin/ig65m-pytorch", name, num_classes=ncls, pretrained=True
    )
    torch.save(model.state_dict(), f"data/{name}.pth")
    print(f"saved data/{name}.pth ({ncls}-way head)")
EOF

echo "done; see header comments for the conversion commands"
