from seal3d_tpu.render.occupancy import OccupancyState, occupancy_init, occupancy_update, mark_untrained
from seal3d_tpu.render.renderer import RenderOptions, render_rays, render_rays_dense
