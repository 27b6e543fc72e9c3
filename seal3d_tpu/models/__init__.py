"""Field networks (functional: init -> params pytree, apply -> outputs).

One module per backbone, mirroring the reference's L2 layer (SURVEY.md §1):
ngp (nerf/network.py), tensorf VM/CP (tensoRF/network*.py), ccnerf
(tensoRF/network_cc.py), dnerf (dnerf/network*.py), sdf (sdf/netowrk.py).

Instead of the reference's inheritance ("networks ARE renderer subclasses"),
each backbone here exposes a flat functional interface consumed by
render/renderer.py:

    init(key, cfg)                      -> params (pytree)
    density(params, cfg, x)             -> {"sigma": [M], "geo_feat": [M, G]}
    color(params, cfg, x, d, geo_feat)  -> rgb [M, 3]
    apply(params, cfg, x, d)            -> (sigma [M], rgb [M, 3])
    background(params, cfg, sph, d)     -> rgb [M, 3]  (optional)

Teacher/student grafting (reference SealNeRF/network.py dynamic class
composition) becomes trivially "two param pytrees, one apply fn".
"""

from seal3d_tpu.models import ngp
from seal3d_tpu.models.mlp import mlp_init, mlp_apply
