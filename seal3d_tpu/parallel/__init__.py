from seal3d_tpu.parallel.mesh import make_mesh, data_sharding, replicate, shard_rays
