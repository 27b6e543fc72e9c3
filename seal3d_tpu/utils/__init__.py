from seal3d_tpu.utils.losses import mape_loss, huber_loss, eff_distloss
from seal3d_tpu.utils.color import srgb_to_linear, linear_to_srgb
from seal3d_tpu.utils.seeding import seed_everything
