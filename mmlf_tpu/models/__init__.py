from .feed_forward import FeedForward, laplacian  # noqa: F401
from .unet import UNet  # noqa: F401
from .ensemble import Ensemble, Ensamble  # noqa: F401
from .inn import INN  # noqa: F401
