from yolojax.postprocess.nms import (  # noqa: F401
    nms_greedy_lax,
    batched_nms,
    postprocess_v2,
    postprocess_v1,
)
from yolojax.postprocess.pallas_nms import nms_greedy_pallas  # noqa: F401
