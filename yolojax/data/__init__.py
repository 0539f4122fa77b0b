from yolojax.data.augment import (  # noqa: F401
    AugmentConfig,
    augment_batch,
    letterbox_host,
    rgb_to_hsv,
    hsv_to_rgb,
)
from yolojax.data.cache import build_cache, load_cache, DatasetCache  # noqa: F401
from yolojax.data.loader import Loader, LoaderConfig  # noqa: F401
