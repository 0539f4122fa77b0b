from yolojax.convert.darknet import (  # noqa: F401
    load_darknet_weights,
    save_darknet_weights,
)
from yolojax.convert.store import load_params_npz, save_params_npz  # noqa: F401
from yolojax.convert.tf1 import load_tf1_checkpoint  # noqa: F401
