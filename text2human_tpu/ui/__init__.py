from text2human_tpu.ui.session import (
    PALETTE,
    InteractiveSession,
    palette_to_segm,
    segm_to_palette,
)
