from seal3d_tpu.data.rays import get_rays, get_full_rays
from seal3d_tpu.data.provider import NeRFDataset, nerf_matrix_to_ngp, rand_poses
from seal3d_tpu.data.synthetic import SyntheticScene
