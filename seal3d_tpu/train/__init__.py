from seal3d_tpu.train.trainer import Trainer, TrainConfig, TrainState
from seal3d_tpu.train.metrics import PSNRMeter, psnr
