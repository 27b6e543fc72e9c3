#!/bin/bash
# Train NGP on the built-in synthetic scene with the TPU fast path
# (analog of the reference's lego recipe, readme.md:91).
python main_nerf.py synthetic -O --workspace workspace_ngp \
  --bound 1.0 --dt_gamma 0 --min_near 0.05 --iters 3000 --save_mesh "$@"
