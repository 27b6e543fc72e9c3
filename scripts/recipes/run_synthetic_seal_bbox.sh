#!/bin/bash
# Bbox edit on the synthetic scene: train a teacher, then distill the edit
# (analog of the reference's lego_bbox recipe, readme.md:106-113).
mkdir -p seal_config_bbox
cat > seal_config_bbox/seal.json <<'JSON'
{
  "type": "bbox",
  "raw": [[0.15,-0.1,-0.2],[0.55,-0.1,-0.2],[0.15,0.3,-0.2],[0.15,-0.1,0.2],
          [0.55,0.3,-0.2],[0.55,-0.1,0.2],[0.15,0.3,0.2],[0.55,0.3,0.2]],
  "transform": [[1,0,0,0],[0,1,0,0.35],[0,0,1,0],[0,0,0,1]],
  "scale": [1,1,1]
}
JSON
python main_SealNeRF.py synthetic -O --workspace workspace_seal \
  --seal_config seal_config_bbox --train_teacher 2000 \
  --bound 1.0 --dt_gamma 0 --min_near 0.05 \
  --pretraining_epochs 50 --extra_epochs 500 "$@"
