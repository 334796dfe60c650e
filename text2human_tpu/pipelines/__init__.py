from text2human_tpu.pipelines.sample import (
    SamplePipeline,
    texture_mask_from_segm,
)
