from .postprocess import (
    semantic_inference,
    panoptic_inference,
    instance_inference,
    sem_seg_postprocess,
    segments_info_from_arrays,
)
