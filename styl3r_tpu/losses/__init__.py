from .vgg import VGG19Features, convert_torchvision_vgg19, imagenet_normalize
from .style import style_loss, identity_loss, calc_mean_std
from .basic import mse_loss
from .ssim import ssim
from .lpips import LPIPSVgg16, convert_lpips_state

__all__ = [
    "VGG19Features",
    "convert_torchvision_vgg19",
    "imagenet_normalize",
    "style_loss",
    "identity_loss",
    "calc_mean_std",
    "mse_loss",
    "ssim",
    "LPIPSVgg16",
    "convert_lpips_state",
]
