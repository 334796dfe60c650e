from text2human_tpu.trainers.base import TrainState, lr_for_epoch, make_optimizer
