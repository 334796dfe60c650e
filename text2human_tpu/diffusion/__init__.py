from text2human_tpu.diffusion.absorbing import (
    AbsorbingDiffusion,
    sample_loop,
    train_loss,
)
