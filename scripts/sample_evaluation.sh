#!/bin/bash
# Re-evaluate saved PatchCore memory banks
# (bin/load_and_evaluate_patchcore.py equivalent).
datapath=${1:-/data/mvtec_ad}
loadpath=${2:-results/wr50_im224/models}

python -m tpu_ac.cli.patchcore results/eval_rerun \
    --data_path "$datapath" -b wideresnet50 -le layer2 -le layer3 \
    --pretrain_embed_dimension 1024 --target_embed_dimension 1024 \
    --resize 256 --imagesize 224 --load_path "$loadpath"
