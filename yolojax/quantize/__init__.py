from yolojax.quantize.ptq import (  # noqa: F401
    calibrate,
    quantize_model,
    apply_int8,
    QuantizedModel,
)

# QAT symbols are training-only machinery whose module imports optax; a
# lazy re-export keeps int8 SERVING startups (detect/serve/eval import
# ptq through this package) from paying the optax/chex import cost.
_QAT_SYMBOLS = (
    "QatConfig", "QatState", "fake_quant", "make_qat_optimizer",
    "make_qat_step", "qat_forward", "reembed_folded",
)


def __getattr__(name):
    if name in _QAT_SYMBOLS:
        from yolojax.quantize import qat

        return getattr(qat, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_QAT_SYMBOLS))
