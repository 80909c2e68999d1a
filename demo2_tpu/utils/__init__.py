from .meter import AverageMeter
from .logger import setup_logger
