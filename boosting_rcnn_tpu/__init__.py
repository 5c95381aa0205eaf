"""boosting_rcnn_tpu — a TPU-native detection framework with the
capabilities of mousecpn/Boosting-R-CNN (mmdetection 2.17 fork), rebuilt
from scratch on JAX/XLA."""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import Config, load_config  # noqa: F401

__all__ = ["Config", "load_config", "__version__"]


def build_detector(*args, **kwargs):
    from .builder import build_detector as _b

    return _b(*args, **kwargs)


def init_detector(*args, **kwargs):
    from .apis import init_detector as _f

    return _f(*args, **kwargs)


def inference_detector(*args, **kwargs):
    from .apis import inference_detector as _f

    return _f(*args, **kwargs)
