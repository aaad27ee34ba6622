from .attack_step import (
    AttackConfig,
    AttackState,
    RuntimeFlags,
    AttackEngine,
)
