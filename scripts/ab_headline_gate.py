"""End-to-end headline A/B for one env gate: runs the production-default
view-input headline step (same engine/batch/timing as bench.py) in THIS
process with whatever FLICKER_* env the caller exported.

Usage:
  python scripts/ab_headline_gate.py                          # current env
  FLICKER_S1V_PALLAS=1 python scripts/ab_headline_gate.py     # gated arm
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    import bench

    rng = np.random.default_rng(0)
    batch = {
        "video": rng.integers(
            0, 255, (bench.BATCH, bench.FRAMES, bench.SIZE, bench.SIZE, 3),
            dtype=np.uint8,
        ),
        "labels": rng.integers(0, 400, (bench.BATCH,), dtype=np.int64),
    }
    engine, _, _ = bench.build_engine(jnp.bfloat16)
    assert engine.view_input_eligible(bench.BATCH, bench.FRAMES)
    from flickering_adversarial_video_tpu.data.packing import pack_batch_view_np

    view_batch = {
        "video_view": pack_batch_view_np(batch["video"]),
        "labels": batch["labels"],
    }
    rate = bench.time_optimized(engine, view_batch)
    gates = {k: v for k, v in os.environ.items() if k.startswith("FLICKER_")}
    print(f"headline view-input: {rate:.3f} steps/s  ({1e3/rate:.2f} ms)  gates={gates}")


if __name__ == "__main__":
    main()
