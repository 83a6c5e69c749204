from . import degradations, img_utils, metrics, options, torch_import
from .img_utils import split_eyes, tensor2img
from .metrics import calculate_psnr, calculate_ssim
from .options import NoneDict, check_resume, dict2str, dict_to_nonedict, parse

__all__ = [
    "degradations", "img_utils", "metrics", "options", "torch_import",
    "tensor2img", "split_eyes", "calculate_psnr", "calculate_ssim",
    "NoneDict", "check_resume", "dict2str", "dict_to_nonedict", "parse",
]
