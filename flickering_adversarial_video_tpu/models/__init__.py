from .i3d import InceptionI3D, I3D_ENDPOINTS
from .video_resnet import VideoResNet, r3d_18, mc3_18, r2plus1d_18, r2plus1d_34
from .registry import create_model, MODEL_REGISTRY
