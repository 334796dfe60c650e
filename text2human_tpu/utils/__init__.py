from text2human_tpu.utils.logger import MessageLogger, get_root_logger
from text2human_tpu.utils.misc import AverageMeter, make_exp_dirs, set_random_seed
from text2human_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
