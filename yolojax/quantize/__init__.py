from yolojax.quantize.ptq import (  # noqa: F401
    calibrate,
    quantize_model,
    apply_int8,
    QuantizedModel,
)
from yolojax.quantize.qat import (  # noqa: F401
    QatConfig,
    QatState,
    fake_quant,
    make_qat_optimizer,
    make_qat_step,
    qat_forward,
    reembed_folded,
)
