"""Core TPU ops: the Pallas/XLA equivalents of the reference's five CUDA extensions.

Reference (CUDA)            -> here (JAX/XLA/Pallas)
---------------------------------------------------------------
raymarching/src/*.cu        -> raymarch.py, composite.py, morton.py, bitfield.py
gridencoder/src/*.cu        -> hashgrid.py (+ pallas/hash_encode.py)
shencoder/src/*.cu          -> sh.py
freqencoder/src/*.cu        -> freq.py
ffmlp/src/*.cu              -> plain XLA matmul chains (models/mlp.py); the MXU
                               + XLA fusion make a hand-fused MLP kernel moot.
"""

from seal3d_tpu.ops.morton import morton3d, morton3d_invert
from seal3d_tpu.ops.bitfield import packbits, bitfield_lookup
from seal3d_tpu.ops.trunc_exp import trunc_exp
from seal3d_tpu.ops.freq import freq_encode
from seal3d_tpu.ops.sh import sh_encode
from seal3d_tpu.ops.hashgrid import HashGridConfig, hashgrid_init, hashgrid_encode
from seal3d_tpu.ops.raymarch import (march_rays, march_rays_grid,
                                      near_far_from_aabb, sph_from_ray)
