from .attack_step import (
    AttackConfig,
    AttackState,
    RuntimeFlags,
    AttackEngine,
)
from .vector_sweep import (
    VectorSweepEngine,
    vector_fit_many_videos,
    vector_single_video_attacks,
)
