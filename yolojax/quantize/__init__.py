from yolojax.quantize.ptq import (  # noqa: F401
    calibrate,
    quantize_model,
    apply_int8,
    QuantizedModel,
)
